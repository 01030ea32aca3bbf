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


def test_q8_orphan_suppkey_excluded_from_denominator(tmp_path):
    # review r04: a lineitem whose l_suppkey has no supplier row must be
    # dropped from BOTH share components (the SQL twin inner-joins
    # supplier); the engine previously kept its volume in share_den_hc
    import shutil

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path / "sf")
    shutil.copytree(SF, d)

    con = duckdb.connect()
    for t in ("orders", "customer", "nation", "region", "part", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
    # an order inside the q8 window from an ASIA customer, and a STANDARD
    # part — the orphan lineitem must otherwise fully qualify for vol
    row = con.sql(
        """
        SELECT o_orderkey FROM orders JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1997-01-01'
        LIMIT 1
        """
    ).fetchall()
    pk_row = con.sql(
        "SELECT p_partkey FROM part WHERE p_type = 'STANDARD' LIMIT 1"
    ).fetchall()
    assert row and pk_row, "sf0.001 fixture must contain a qualifying order/part"

    li = pq.read_table(f"{d}/lineitem.parquet")
    orphan = pa.table(
        {
            "l_orderkey": pa.array([row[0][0]], type=li["l_orderkey"].type),
            "l_partkey": pa.array([pk_row[0][0]], type=li["l_partkey"].type),
            "l_suppkey": pa.array([99_999_999], type=li["l_suppkey"].type),
            "l_extendedprice": pa.array([1000.0], type=li["l_extendedprice"].type),
            "l_discount": pa.array([0.0], type=li["l_discount"].type),
            **{
                c: pa.nulls(1, li[c].type)
                for c in li.column_names
                if c
                not in (
                    "l_orderkey", "l_partkey", "l_suppkey",
                    "l_extendedprice", "l_discount",
                )
            },
        }
    ).select(li.column_names)
    pq.write_table(pa.concat_tables([li, orphan]), f"{d}/lineitem.parquet")

    from simple_osm_queries_ray.pipelines.relational import q8_market_share

    eng = (
        q8_market_share(d)
        .to_pandas()
        .sort_values("o_year")
        .reset_index(drop=True)
    )

    import __ray_entry__ as entrymod

    con2 = duckdb.connect()
    for t in ("orders", "customer", "nation", "region", "part", "lineitem", "supplier"):
        con2.sql(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
    ora = (
        con2.sql(entrymod.oracle_sql()["tpch_q8"])
        .df()
        .sort_values("o_year")
        .reset_index(drop=True)
    )
    assert eng["o_year"].tolist() == ora["o_year"].tolist()
    assert eng["share_num_hc"].tolist() == ora["share_num_hc"].tolist()
    assert eng["share_den_hc"].tolist() == ora["share_den_hc"].tolist()
