"""Degenerate-selectivity regressions for the TPC-H-shaped pipelines: empty
broadcast sides must yield empty results, not IndexError inside Ray tasks."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_q10_empty_order_window_returns_empty():
    from simple_osm_queries_ray.pipelines.relational import q10_returned_item_revenue

    out = q10_returned_item_revenue(SF, date_lo="1990-01-01", date_hi="1990-01-02")
    assert len(out) == 0
    assert list(out.columns) == [
        "c_custkey", "c_name", "revenue_hc", "acctbal_cents", "n_name",
    ]


def test_q17_unknown_brand_returns_zero():
    from simple_osm_queries_ray.pipelines.relational import q17_small_quantity_revenue

    out = q17_small_quantity_revenue(SF, brands=("Brand#9999",))
    assert len(out) == 1
    assert int(out["total_small_qty_cents"].iloc[0]) == 0


def test_q15_ties_deterministic():
    from simple_osm_queries_ray.pipelines.relational import q15_top_supplier

    a = q15_top_supplier(SF)
    b = q15_top_supplier(SF)
    assert a.equals(b)
    assert np.all(np.diff(a["s_suppkey"].to_numpy()) > 0) or len(a) <= 1


def test_q15_empty_date_window_returns_empty():
    # ADVICE r03: empty bucketed-sum Dataset drops its schema in to_pandas
    # -> KeyError 'rev'; q15 must pin the documented columns like q10/q17
    from simple_osm_queries_ray.pipelines.relational import q15_top_supplier

    out = q15_top_supplier(SF, date_lo="1990-01-01", date_hi="1990-01-02")
    assert len(out) == 0
    assert list(out.columns) == ["s_suppkey", "s_name", "total_revenue_hc"]


def test_q2_unknown_brand_returns_empty():
    # ADVICE r03: no matching parts -> schema-less per_ps dataset ->
    # AttributeError in hash_join_attach; q2 must early-return empty
    from simple_osm_queries_ray.pipelines.relational import q2_cheapest_supplier

    out = q2_cheapest_supplier(SF, brands=("Brand#9999",))
    assert len(out) == 0
    assert list(out.columns) == [
        "p_partkey", "p_brand", "s_suppkey", "s_name", "best_unit_mc",
    ]


def test_q2_brand_with_no_lineitems_returns_empty(tmp_path):
    # review r04: the len(pk)==0 guard misses the case where brand parts
    # exist but NO lineitem references them — per_ps is then a schema-less
    # empty dataset and hash_join_attach crashed on a None schema
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path / "sf")
    shutil.copytree(SF, d)
    part = pq.read_table(f"{d}/part.parquet")
    extra = pa.table(
        {
            "p_partkey": pa.array([99_999_999], type=part["p_partkey"].type),
            "p_brand": pa.array(["Brand#ZZ"], type=part["p_brand"].type),
            **{
                c: pa.nulls(1, part[c].type)
                for c in part.column_names
                if c not in ("p_partkey", "p_brand")
            },
        }
    ).select(part.column_names)
    pq.write_table(pa.concat_tables([part, extra]), f"{d}/part.parquet")

    from simple_osm_queries_ray.pipelines.relational import q2_cheapest_supplier

    out = q2_cheapest_supplier(d, brands=("Brand#ZZ",))
    assert len(out) == 0
    assert list(out.columns) == [
        "p_partkey", "p_brand", "s_suppkey", "s_name", "best_unit_mc",
    ]
