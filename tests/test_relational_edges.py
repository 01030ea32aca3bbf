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
