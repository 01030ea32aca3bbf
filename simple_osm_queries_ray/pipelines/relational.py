"""Relational pipelines over the TPC-H-ish testdata tables.

The reference is a spatial engine, but its execution primitives — vectorized
batch predicates, broadcast semi-joins, pre-aggregated groupbys, top-k —
are generic; these pipelines exercise them on the relational tables the
sandbox ships, with DuckDB oracles.

Determinism discipline: monetary doubles are summed as integer cents
(CAST(ROUND(x*100) AS BIGINT)) so distributed summation order cannot change
the result; the SQL oracles do the identical transformation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..sources.read import read_parquet_sized
from ..state.broadcast import get as bget


def _cents(col) -> np.ndarray:
    return np.round(np.asarray(col, dtype=np.float64) * 100).astype(np.int64)


def _bucketed_key_sum(
    ds: ray.data.Dataset,
    key: str,
    val_cols: list[str],
    num_buckets: int = 32,
    having_min: tuple[str, int] | None = None,
) -> ray.data.Dataset:
    """Sum ``val_cols`` per int64 ``key`` — thin wrapper over the shared
    :func:`..stages.group_collect.bucketed_sum` (ONE implementation of the
    high-cardinality bucketed-reduce discipline to maintain; the generic
    ``groupby(key).aggregate(Sum)`` costs ~8 s at 147 k keys where this is
    ~0.5 s). ``having_min=(col, m)`` post-filters groups to col > m —
    equivalent to the in-bucket HAVING since every group is fully reduced."""
    from ..stages.group_collect import bucketed_sum

    out = bucketed_sum(ds, [key], val_cols, num_buckets=num_buckets)
    if having_min is not None:
        col, m = having_min

        def having(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.greater(batch[col], pa.scalar(m, batch[col].type))
            )

        out = out.map_batches(having, batch_format="pyarrow")
    return out


def q1_pricing_summary(sf_dir: str, ship_cutoff: str = "1998-09-02") -> ray.data.Dataset:
    """TPC-H Q1 shape: filter on shipdate, groupby (returnflag, linestatus),
    integer-cent sums + counts. Partial aggregation per batch -> tiny shuffle."""
    ds = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_shipdate"],
    )
    cutoff = np.datetime64(ship_cutoff)

    def partial(batch: pa.Table) -> pa.Table:
        ship = np.asarray(batch["l_shipdate"], dtype="datetime64[D]")
        keep = ship <= cutoff
        df = pd.DataFrame(
            {
                "l_returnflag": np.asarray(batch["l_returnflag"])[keep],
                "l_linestatus": np.asarray(batch["l_linestatus"])[keep],
                "qty": np.asarray(batch["l_quantity"], dtype=np.int64)[keep],
                "price_c": _cents(batch["l_extendedprice"])[keep],
            }
        )
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("qty", "sum"), sum_base_price_cents=("price_c", "sum"), n=("qty", "size")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(4)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_price_cents", alias_name="sum_base_price_cents"),
            Sum("n", alias_name="n"),
        )
    )


def q3_top_orders(sf_dir: str, segment: str = "BUILDING", k: int = 10) -> ray.data.Dataset:
    """TPC-H Q3 shape: semi-join lineitem against the qualifying order set
    (customer segment filter, broadcast), groupby orderkey revenue, top-k.

    Broadcast-vs-shuffle: customers and orders are the small side (1:40 vs
    lineitem); their qualifying key sets ship once via ray.put. Revenue is
    integer cents; top-k = per-batch partial top-k then one tiny reduce."""
    import pyarrow.parquet as pq

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    ckeys = np.sort(
        np.asarray(cust["c_custkey"], dtype=np.int64)[
            np.asarray(cust["c_mktsegment"].to_numpy(zero_copy_only=False) == segment)
        ]
    )
    orders = pq.read_table(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    okey = np.asarray(orders["o_orderkey"], dtype=np.int64)
    ocust = np.asarray(orders["o_custkey"], dtype=np.int64)
    pos = np.searchsorted(ckeys, ocust)
    pos = np.clip(pos, 0, max(len(ckeys) - 1, 0))
    qualifying = np.sort(okey[(ckeys[pos] == ocust) if len(ckeys) else np.zeros(len(okey), bool)])
    q_ref = ray.put(qualifying)

    ds = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        q = bget(q_ref)
        ok = np.asarray(batch["l_orderkey"], dtype=np.int64)
        p = np.searchsorted(q, ok)
        p = np.clip(p, 0, max(len(q) - 1, 0))
        keep = (q[p] == ok) if len(q) else np.zeros(len(ok), dtype=bool)
        ok = ok[keep]
        # revenue in integer hundredths-of-cents: price_c * (100 - disc_pct)
        price_c = _cents(batch["l_extendedprice"])[keep]
        disc_pct = np.round(np.asarray(batch["l_discount"], dtype=np.float64)[keep] * 100).astype(
            np.int64
        )
        rev = price_c * (100 - disc_pct)
        df = pd.DataFrame({"o_orderkey": ok, "revenue_hc": rev})
        g = df.groupby("o_orderkey", as_index=False).agg(revenue_hc=("revenue_hc", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    agg = _bucketed_key_sum(
        ds.map_batches(partial, batch_format="pyarrow"), "o_orderkey", ["revenue_hc"]
    )

    def topk(batch: pa.Table) -> pa.Table:
        rev = np.asarray(batch["revenue_hc"], dtype=np.int64)
        keys = np.asarray(batch["o_orderkey"], dtype=np.int64)
        order = np.lexsort((keys, -rev))[:k]
        return pa.table({"o_orderkey": pa.array(keys[order]), "revenue_hc": pa.array(rev[order])})

    # per-partition top-k, then one final tiny reduce
    return agg.map_batches(topk, batch_format="pyarrow").repartition(1).map_batches(
        topk, batch_format="pyarrow"
    )


def orders_per_nation(sf_dir: str) -> ray.data.Dataset:
    """orders -> customer -> nation rollup via two broadcast lookups (the
    dimension tables never shuffle) + pre-aggregated count."""
    import pyarrow.parquet as pq

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    ck = np.asarray(cust["c_custkey"], dtype=np.int64)
    cn = np.asarray(cust["c_nationkey"], dtype=np.int64)
    order_c = np.argsort(ck)
    nk = np.asarray(nat["n_nationkey"], dtype=np.int64)
    order_n = np.argsort(nk)
    lookup_ref = ray.put(
        (
            ck[order_c],
            cn[order_c],
            nk[order_n],
            nat["n_name"].to_numpy(zero_copy_only=False)[order_n],
        )
    )

    ds = read_parquet_sized(f"{sf_dir}/orders.parquet", columns=["o_custkey"])

    def partial(batch: pa.Table) -> pa.Table:
        ck_s, cn_s, nk, nname = bget(lookup_ref)
        oc = np.asarray(batch["o_custkey"], dtype=np.int64)
        p = np.searchsorted(ck_s, oc)
        nation_key = cn_s[p]  # every order has a customer (FK)
        name = nname[np.searchsorted(nk, nation_key)]
        u, c = np.unique(name, return_counts=True)
        return pa.table(
            {"n_name": pa.array(u.astype(object), type=pa.string()), "n_orders": pa.array(c.astype(np.int64))}
        )

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(2)
        .groupby("n_name")
        .aggregate(Sum("n_orders", alias_name="n_orders"))
    )


def q5_local_supplier_revenue(
    sf_dir: str, region: str = "ASIA", date_lo: str = "1995-01-01", date_hi: str = "1996-01-01",
    *, bloom_prefilter: bool = False,
) -> ray.data.Dataset:
    """TPC-H Q5 shape: revenue per nation where customer and supplier share the
    nation, within one region and order-date year. Output: (n_name,
    revenue_hc) with revenue in integer hundredths-of-cents.

    Distributed plan (the multi-way-join benchmark of the relational family):

    - nation JOIN region and the supplier -> nation map are broadcast
      (dimension tables: tiny at any scale);
    - orders(date-filtered) JOIN customer on custkey is partitioned hash
      join #1 (both sides large at real scale — neither is broadcast);
    - lineitem JOIN the result on orderkey is partitioned hash join #2;
      unmatched lineitems (orders outside the window) drop out of the left
      join by the null c_nationkey;
    - the local-supplier predicate + revenue partials are one vectorized
      map_batches, so the final groupby shuffles only per-nation partials.
    """
    from ray.data.aggregate import Sum

    from ..stages.joins import hash_join_attach

    import pyarrow.parquet as pq

    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    reg = pq.read_table(f"{sf_dir}/region.parquet")
    rkeys = {
        r["r_regionkey"] for r in reg.to_pylist() if r["r_name"] == region
    }
    nation_name = {
        r["n_nationkey"]: r["n_name"] for r in nat.to_pylist() if r["n_regionkey"] in rkeys
    }
    sup = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    s_keys = np.asarray(sup["s_suppkey"], dtype=np.int64)
    s_nat = np.asarray(sup["s_nationkey"], dtype=np.int64)
    order_ = np.argsort(s_keys)
    ref = ray.put((s_keys[order_], s_nat[order_], dict(nation_name)))

    lo, hi = np.datetime64(date_lo), np.datetime64(date_hi)
    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def filter_orders(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch["o_orderdate"], dtype="datetime64[D]")
        keep = (d >= lo) & (d < hi)
        return batch.select(["o_orderkey", "o_custkey"]).filter(pa.array(keep))

    orders_f = orders.map_batches(filter_orders, batch_format="pyarrow")
    customer = read_parquet_sized(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    orders_cn = hash_join_attach(
        orders_f, "o_custkey", customer, "c_custkey", {"c_nationkey": pa.int32()}
    ).select_columns(["o_orderkey", "c_nationkey"])

    lineitem = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    if bloom_prefilter:
        # the date filter makes orders selective; a bloom of its orderkeys
        # drops most lineitem rows BEFORE the join's shuffle (no false
        # negatives -> identical result, pinned by test)
        from ..functions.bloom import build_bloom

        orders_cn = orders_cn.materialize()  # consumed by bloom build AND join
        bl = ray.put(build_bloom(orders_cn, "o_orderkey"))
        from ..state.broadcast import get as _bget

        def prefilter(batch: pa.Table) -> pa.Table:
            f = _bget(bl)
            keep = f.might_contain(np.asarray(batch["l_orderkey"], dtype=np.int64))
            return batch.filter(pa.array(keep))

        lineitem = lineitem.map_batches(prefilter, batch_format="pyarrow")
    joined = hash_join_attach(
        lineitem, "l_orderkey", orders_cn, "o_orderkey", {"c_nationkey": pa.int32()}
    )

    def partial(batch: pa.Table) -> pa.Table:
        sk, sn, names = bget(ref)
        cn_col = batch["c_nationkey"].combine_chunks()
        valid = ~np.asarray(cn_col.is_null())
        if not valid.any():
            return pa.table({"n_name": pa.array([], type=pa.string()),
                             "revenue_hc": pa.array([], type=pa.int64())})
        cn = np.asarray(cn_col.fill_null(-1), dtype=np.int64)
        lsk = np.asarray(batch["l_suppkey"], dtype=np.int64)
        pos = np.searchsorted(sk, lsk)
        pos_c = np.clip(pos, 0, len(sk) - 1)
        sup_nat = np.where(sk[pos_c] == lsk, sn[pos_c], -2)
        keep = valid & (sup_nat == cn) & np.isin(cn, list(names))
        if not keep.any():
            return pa.table({"n_name": pa.array([], type=pa.string()),
                             "revenue_hc": pa.array([], type=pa.int64())})
        price_c = _cents(batch["l_extendedprice"])[keep]
        disc = np.round(np.asarray(batch["l_discount"], dtype=np.float64)[keep] * 100).astype(np.int64)
        rev = price_c * (100 - disc)
        df = pd.DataFrame({"nk": cn[keep], "revenue_hc": rev}).groupby("nk", as_index=False).sum()
        return pa.table(
            {
                "n_name": pa.array([names[k] for k in df["nk"]], type=pa.string()),
                "revenue_hc": pa.array(df["revenue_hc"].to_numpy(), type=pa.int64()),
            }
        )

    return (
        joined.map_batches(partial, batch_format="pyarrow")
        .repartition(4)
        .groupby("n_name")
        .aggregate(Sum("revenue_hc", alias_name="revenue_hc"))
    )


def q14_promo_revenue(
    sf_dir: str, month_lo: str = "1995-09-01", month_hi: str = "1995-10-01",
    promo_type: str = "ECONOMY",
) -> pd.DataFrame:
    """TPC-H Q14 shape: share of one month's revenue from parts of one type.
    Output: one row (promo_hc, total_hc, promo_pct).

    lineitem(month-filtered) JOIN part on partkey is a partitioned hash join
    (part is the smaller-but-large table — not broadcast, matching the plan
    at real scale); both sums accumulate as integer hundredths-of-cents in
    per-batch partials so the single final division is the only float op
    and is bit-identical to the SQL's CAST(...)/CAST(...)."""
    from ..stages.joins import hash_join_attach

    lo, hi = np.datetime64(month_lo), np.datetime64(month_hi)
    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def filt(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch["l_shipdate"], dtype="datetime64[D]")
        return batch.select(["l_partkey", "l_extendedprice", "l_discount"]).filter(
            pa.array((d >= lo) & (d < hi))
        )

    part = read_parquet_sized(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"])
    joined = hash_join_attach(
        li.map_batches(filt, batch_format="pyarrow"),
        "l_partkey", part, "p_partkey", {"p_type": pa.string()},
    )

    def partial(batch: pa.Table) -> pa.Table:
        price_c = _cents(batch["l_extendedprice"])
        disc = np.round(np.asarray(batch["l_discount"], dtype=np.float64) * 100).astype(np.int64)
        rev = price_c * (100 - disc)
        promo = np.asarray(pa.compute.equal(batch["p_type"], pa.scalar(promo_type)).fill_null(False))
        return pa.table(
            {
                "promo_hc": pa.array([int(rev[promo].sum())], type=pa.int64()),
                "total_hc": pa.array([int(rev.sum())], type=pa.int64()),
            }
        )

    parts_ = joined.map_batches(partial, batch_format="pyarrow").to_pandas()
    promo_hc = int(parts_["promo_hc"].sum())
    total_hc = int(parts_["total_hc"].sum())
    pct = 100.0 * float(promo_hc) / float(total_hc) if total_hc else 0.0
    return pd.DataFrame(
        {"promo_hc": [promo_hc], "total_hc": [total_hc], "promo_pct": [pct]}
    )


def orders_rollup(sf_dir: str) -> pd.DataFrame:
    """OLAP rollup: order counts by (nation, priority), plus per-nation
    subtotals and a grand total ('ALL' marker rows — no NULL ambiguity).
    Output: (n_name, o_orderpriority, n_orders).

    Shape: ONE corpus aggregation at the finest grain (per-batch partials,
    tiny nation x priority shuffle); the coarser rollup levels derive from
    the finest aggregate driver-side — at any scale the cube is
    dimension-sized, not data-sized, so re-scanning per level would be
    wasted I/O."""
    from ray.data.aggregate import Sum

    import pyarrow.parquet as pq

    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nname = dict(zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist()))
    cnat = {
        c: nname[n]
        for c, n in zip(cust["c_custkey"].to_pylist(), cust["c_nationkey"].to_pylist())
    }
    ref = ray.put(cnat)

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        m = bget(ref)
        df = pd.DataFrame(
            {
                "n_name": [m[c] for c in batch["o_custkey"].to_pylist()],
                "o_orderpriority": np.asarray(batch["o_orderpriority"]),
            }
        )
        g = df.groupby(["n_name", "o_orderpriority"], as_index=False).size()
        g["n_orders"] = g.pop("size").astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    fine = (
        orders.map_batches(partial, batch_format="pyarrow")
        .repartition(4)
        .groupby(["n_name", "o_orderpriority"])
        .aggregate(Sum("n_orders", alias_name="n_orders"))
        .to_pandas()
    )
    sub = fine.groupby("n_name", as_index=False)["n_orders"].sum()
    sub["o_orderpriority"] = "ALL"
    total = pd.DataFrame(
        {"n_name": ["ALL"], "o_orderpriority": ["ALL"], "n_orders": [fine["n_orders"].sum()]}
    )
    out = pd.concat([fine, sub, total], ignore_index=True)
    out["n_orders"] = out["n_orders"].astype(np.int64)
    return out[["n_name", "o_orderpriority", "n_orders"]]


def q6_forecast_revenue(
    sf_dir: str,
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
    disc_pct_lo: int = 5,
    disc_pct_hi: int = 7,
    max_qty: int = 24,
) -> pd.DataFrame:
    """TPC-H Q6 shape: pure filter + global sum, the cheapest possible scan —
    column-pruned read, vectorized predicate, one integer partial per batch,
    driver sees two numbers. The discount predicate runs on the ROUNDED
    integer percentage on both sides (float equality on 0.05-step doubles is
    not reproducible; the integer is). Revenue unit: cents x pct (an exactly
    associative int64 sum)."""
    ds = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )
    lo, hi = np.datetime64(date_lo), np.datetime64(date_hi)

    def partial(batch: pa.Table) -> pa.Table:
        ship = np.asarray(batch["l_shipdate"], dtype="datetime64[D]")
        dp = np.round(
            np.asarray(batch["l_discount"], dtype=np.float64) * 100
        ).astype(np.int64)
        qty = np.asarray(batch["l_quantity"], dtype=np.int64)
        keep = (
            (ship >= lo)
            & (ship < hi)
            & (dp >= disc_pct_lo)
            & (dp <= disc_pct_hi)
            & (qty < max_qty)
        )
        rev = int((_cents(batch["l_extendedprice"])[keep] * dp[keep]).sum())
        return pa.table(
            {
                "revenue_cpct": pa.array([rev], type=pa.int64()),
                "n_rows": pa.array([int(keep.sum())], type=pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    agg = ds.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("revenue_cpct", alias_name="revenue_cpct"),
        Sum("n_rows", alias_name="n_rows"),
    )
    return pd.DataFrame(
        [{"revenue_cpct": agg["revenue_cpct"], "n_rows": agg["n_rows"]}]
    )


def q18_large_orders(sf_dir: str, min_qty: int = 150) -> ray.data.Dataset:
    """TPC-H Q18 shape (large-volume customers): groupby-HAVING on the big
    table, then the small surviving set joins order metadata. lineitem never
    leaves its scan — per-batch (orderkey, qty) partials feed one groupby;
    the HAVING filter shrinks the set ~50x BEFORE the partitioned hash join
    against orders (classic filter-then-join ordering). Dates travel as
    integer days since epoch (o_days) — integer columns hash identically on
    both sides, TIMESTAMP/date dtypes do not."""
    from ray.data.aggregate import Sum

    from ..stages.joins import hash_join_attach

    line = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        ok = np.asarray(batch["l_orderkey"], dtype=np.int64)
        qty = np.asarray(batch["l_quantity"], dtype=np.int64)
        u, inv = np.unique(ok, return_inverse=True)
        s = np.zeros(len(u), dtype=np.int64)
        np.add.at(s, inv, qty)
        return pa.table({"o_orderkey": pa.array(u), "sum_qty": pa.array(s)})

    big = _bucketed_key_sum(
        line.map_batches(partial, batch_format="pyarrow"),
        "o_orderkey", ["sum_qty"], having_min=("sum_qty", min_qty),
    )

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )

    def order_meta(batch: pa.Table) -> pa.Table:
        days = np.asarray(batch["o_orderdate"], dtype="datetime64[D]").astype(
            np.int64
        )
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "o_custkey": pa.array(
                    np.asarray(batch["o_custkey"], dtype=np.int64)
                ),
                "o_days": pa.array(days),
            }
        )

    return hash_join_attach(
        big,
        "o_orderkey",
        orders.map_batches(order_meta, batch_format="pyarrow"),
        "o_orderkey",
        {"o_custkey": pa.int64(), "o_days": pa.int64()},
    )


def customer_running_total(sf_dir: str, num_buckets: int = 32) -> ray.data.Dataset:
    """Per-customer running order total in integer cents — the cumulative
    window SUM whose float form would NOT replay across engines (window
    sums tree-aggregate; ulp drift flips hashes). Prices convert to exact
    int64 cents first, so the cumsum is associativity-free.

    Shape: ONE hash(customer)-bucket shuffle of three int columns, then a
    per-bucket lexsort + segmented cumsum. Output:
    (o_orderkey, o_custkey, cents, running_cents)."""
    from ..sources.read import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        c = np.asarray(batch["o_custkey"], dtype=np.int64)
        b = np.abs((c * np.int64(-7046029254386353131)) >> np.int64(32)) % num_buckets
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "o_custkey": batch["o_custkey"],
                "d": pa.array(
                    np.asarray(batch["o_orderdate"], dtype="datetime64[us]").astype(
                        np.int64
                    )
                ),
                "cents": pa.array(_cents(batch["o_totalprice"])),
                "__bucket": pa.array(b),
            }
        )

    def per_bucket(tbl: pa.Table) -> pa.Table:
        c = np.asarray(tbl["o_custkey"], dtype=np.int64)
        k = np.asarray(tbl["o_orderkey"], dtype=np.int64)
        d = np.asarray(tbl["d"], dtype=np.int64)
        cents = np.asarray(tbl["cents"], dtype=np.int64)
        order = np.lexsort((k, d, c))
        c, k, cents = c[order], k[order], cents[order]
        run = np.cumsum(cents)
        # reset at customer boundaries: subtract each customer's prefix base
        starts = np.zeros(len(c), dtype=bool)
        starts[0] = True
        starts[1:] = c[1:] != c[:-1]
        base = np.where(starts, run - cents, 0)
        np.maximum.accumulate(base, out=base)
        run = run - base
        return pa.table(
            {
                "o_orderkey": pa.array(k),
                "o_custkey": pa.array(c),
                "cents": pa.array(cents),
                "running_cents": pa.array(run),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def brand_topk_per_type(sf_dir: str, k: int = 3) -> ray.data.Dataset:
    """Grouped top-k: the k most common brands within every part type
    (count desc, brand asc on ties) with their counts — the distributed
    ROW_NUMBER()-window pattern. The (type, brand) aggregate is tiny after
    per-batch partials, so the rank step is a map over one small group per
    type. Output: (p_type, p_brand, n, rk)."""
    from ray.data.aggregate import Sum

    from ..sources.read import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/part.parquet", columns=["p_type", "p_brand"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "p_type": np.asarray(batch["p_type"], dtype=object),
                "p_brand": np.asarray(batch["p_brand"], dtype=object),
            }
        )
        g = df.groupby(["p_type", "p_brand"], sort=False).size().reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False)

    def topk(group: pa.Table) -> pa.Table:
        df = group.to_pandas().sort_values(
            ["n", "p_brand"], ascending=[False, True], kind="mergesort"
        )
        df = df.head(k).reset_index(drop=True)
        df["rk"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["p_type", "p_brand"])
        .aggregate(Sum("n", alias_name="n"))
        .groupby("p_type")
        .map_groups(topk, batch_format="pyarrow")
    )


def orders_price_histogram(sf_dir: str) -> ray.data.Dataset:
    """Log2-bucketed order-value histogram — the long-tail distribution
    profile (binning is the other half of ANALYZE). Buckets are EXACT:
    prices convert to int64 cents and the bucket is the float64 exponent
    (np.frexp — exact for integers < 2^53), never a libm log2 whose
    boundary ulps could flip a power-of-two value between engines; the
    oracle replays the bucket as two integer comparisons against 2^b.

    Shape: per-batch (bucket, n, sum_cents) partials -> one <= 64-key
    groupby. Output: (bucket, n_orders, sum_cents)."""
    from ray.data.aggregate import Sum

    from ..sources.read import read_parquet_sized

    ds = read_parquet_sized(f"{sf_dir}/orders.parquet", columns=["o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = _cents(batch["o_totalprice"])
        cents = cents[cents > 0]
        _, exp = np.frexp(cents.astype(np.float64))
        bucket = (exp - 1).astype(np.int64)  # floor(log2(cents)), exact
        uniq, inv = np.unique(bucket, return_inverse=True)
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        s = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(s, inv, cents)
        return pa.table(
            {"bucket": pa.array(uniq), "n": pa.array(n), "s": pa.array(s)}
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n_orders"), Sum("s", alias_name="sum_cents"))
    )
    return out


def _per_order_max_ship_days(sf_dir: str, num_buckets: int = 32) -> ray.data.Dataset:
    """(o_orderkey, max_days) over lineitem — the shared EXISTS-to-MAX
    sub-plan of q4 / concurrency. Hash-bucket + map_groups with one
    vectorized np.maximum.at per bucket, NOT groupby(key).aggregate(Max):
    Ray's generic aggregate over ~key-count groups costs ~8 s at 147 k keys
    (measured at sf0.1, 32 CPUs) where the bucketed reduce is ~0.5 s — the
    per-group machinery, not the shuffle, is the cost at high key
    cardinality."""
    line = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )

    def max_partial(batch: pa.Table) -> pa.Table:
        ok = np.asarray(batch["l_orderkey"], dtype=np.int64)
        days = np.asarray(batch["l_shipdate"], dtype="datetime64[D]").astype(np.int64)
        u, inv = np.unique(ok, return_inverse=True)
        mx = np.full(len(u), np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(mx, inv, days)
        b = np.abs((u * np.int64(-7046029254386353131)) >> np.int64(32)) % num_buckets
        return pa.table(
            {
                "o_orderkey": pa.array(u),
                "max_days": pa.array(mx),
                "__bucket": pa.array(b.astype(np.int64)),
            }
        )

    def per_bucket(tbl: pa.Table) -> pa.Table:
        ok = np.asarray(tbl["o_orderkey"], dtype=np.int64)
        days = np.asarray(tbl["max_days"], dtype=np.int64)
        u, inv = np.unique(ok, return_inverse=True)
        mx = np.full(len(u), np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(mx, inv, days)
        return pa.table({"o_orderkey": pa.array(u), "max_days": pa.array(mx)})

    return (
        line.map_batches(max_partial, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def q4_late_orders(
    sf_dir: str,
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
    grace_days: int = 30,
) -> ray.data.Dataset:
    """TPC-H Q4 shape (order-priority checking) adapted to the sandbox
    schema: count orders per o_orderpriority, within an orderdate window,
    that have AT LEAST ONE lineitem shipped more than ``grace_days`` after
    the order date (the schema carries no commit/receipt dates, so lateness
    is shipdate vs orderdate + grace).

    The EXISTS decorrelates to an aggregate: EXISTS(l_shipdate > o + g)
    <=> MAX(l_shipdate) > o + g, so lineitem collapses to per-order
    (orderkey, max_ship_days) partials BEFORE any join — the classic
    aggregate-then-join ordering; the date-windowed orders then attach the
    max by partitioned int64 hash join and the survivors feed a 5-key
    count. Dates travel as integer days since epoch (exact on both
    engines). Output: (o_orderpriority, n_late)."""
    from ray.data.aggregate import Sum

    from ..stages.joins import hash_join_attach

    per_order = _per_order_max_ship_days(sf_dir)

    lo = np.datetime64(date_lo, "D").astype(np.int64)
    hi = np.datetime64(date_hi, "D").astype(np.int64)

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )

    def windowed(batch: pa.Table) -> pa.Table:
        days = np.asarray(batch["o_orderdate"], dtype="datetime64[D]").astype(np.int64)
        keep = (days >= lo) & (days < hi)
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"].filter(pa.array(keep)),
                "o_orderpriority": batch["o_orderpriority"].filter(pa.array(keep)),
                "o_days": pa.array(days[keep]),
            }
        )

    joined = hash_join_attach(
        orders.map_batches(windowed, batch_format="pyarrow"),
        "o_orderkey",
        per_order,
        "o_orderkey",
        {"max_days": pa.int64()},
    )

    def late_partial(batch: pa.Table) -> pa.Table:
        mx = np.asarray(
            pc.fill_null(batch["max_days"], pa.scalar(np.iinfo(np.int64).min, pa.int64()))
        )
        late = mx > np.asarray(batch["o_days"], dtype=np.int64) + grace_days
        pri = batch["o_orderpriority"].filter(pa.array(late))
        t = pri.to_pandas().value_counts()
        return pa.table(
            {
                "o_orderpriority": pa.array(t.index.astype(str)),
                "n": pa.array(t.to_numpy().astype(np.int64)),
            }
        )

    return (
        joined.map_batches(late_partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("n", alias_name="n_late"))
    )


def q12_priority_by_flag(
    sf_dir: str, date_lo: str = "1996-01-01", date_hi: str = "1997-01-01"
) -> ray.data.Dataset:
    """TPC-H Q12 shape (shipping-mode priority split) adapted: per
    l_returnflag (the schema's stand-in for shipmode), over lineitems
    shipped inside the window, how many belong to critical-priority orders
    (1-URGENT / 2-HIGH) vs the rest.

    Shape: the big table prunes at the read (3 columns), filters
    vectorized, and attaches the order's 0/1 criticality by partitioned
    int64 hash join (the orders side projects to two ints — at real scale
    neither side broadcasts); per-batch conditional-count partials feed a
    3-key groupby. Output: (l_returnflag, high_count, low_count)."""
    from ray.data.aggregate import Sum

    from ..stages.joins import hash_join_attach

    lo = np.datetime64(date_lo, "D").astype(np.int64)
    hi = np.datetime64(date_hi, "D").astype(np.int64)

    line = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_shipdate"],
    )

    def filt(batch: pa.Table) -> pa.Table:
        days = np.asarray(batch["l_shipdate"], dtype="datetime64[D]").astype(np.int64)
        keep = (days >= lo) & (days < hi)
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"].filter(pa.array(keep)),
                "l_returnflag": batch["l_returnflag"].filter(pa.array(keep)),
            }
        )

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )

    def crit(batch: pa.Table) -> pa.Table:
        pri = batch["o_orderpriority"]
        is_high = pc.or_(
            pc.equal(pri, "1-URGENT"), pc.equal(pri, "2-HIGH")
        )
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "is_high": pc.cast(is_high, pa.int64()),
            }
        )

    joined = hash_join_attach(
        line.map_batches(filt, batch_format="pyarrow"),
        "l_orderkey",
        orders.map_batches(crit, batch_format="pyarrow"),
        "o_orderkey",
        {"is_high": pa.int64()},
    )

    def partial(batch: pa.Table) -> pa.Table:
        flags = batch["l_returnflag"]
        hi_v = np.asarray(pc.fill_null(batch["is_high"], 0), dtype=np.int64)
        df = pd.DataFrame({"f": flags.to_pandas(), "h": hi_v})
        g = df.groupby("f", sort=False)["h"].agg(["sum", "count"])
        return pa.table(
            {
                "l_returnflag": pa.array(g.index.astype(str)),
                "h": pa.array(g["sum"].to_numpy().astype(np.int64)),
                "l": pa.array((g["count"] - g["sum"]).to_numpy().astype(np.int64)),
            }
        )

    return (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(Sum("h", alias_name="high_count"), Sum("l", alias_name="low_count"))
    )


def orders_price_mad(sf_dir: str, *, bin_cap: int = 1_000_000) -> ray.data.Dataset:
    """Exact median absolute deviation of order value — two CHAINED
    distributed k-th order-statistic selections (the robust-statistics
    primitive: median first, then the median of |x - median| computed in a
    second selection over the derived column, which never materializes).
    Prices convert to exact int64 cents, so every comparison is integer and
    the result hashes exactly; the median convention is the lower median
    (0-based rank floor((n-1)/2)), replayed by the oracle's ROW_NUMBER pick.

    Scale shape: each selection is the integer-histogram discipline of
    value_percentiles — per-batch 1024-bin count partials (driver sees
    1024 ints per batch, never values), locate the target bin, recurse
    while it exceeds ``bin_cap``, then pull only that bin (~n/1024 rows)
    for the exact np.partition pick. Output one row:
    (median_cents, mad_cents, n_orders)."""
    from ..sources.read import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_totalprice"]
    ).materialize()

    def batches(transform):
        for b in ds.iter_batches(batch_format="pyarrow", batch_size=None):
            yield transform(_cents(b["o_totalprice"]))

    # Ray-parallel histogram pass: the per-batch partial runs in tasks,
    # the driver reduces 1024-int vectors
    def hist(transform, blo: int, bhi: int, nbins: int = 1024):
        width = max((bhi - blo) // nbins + 1, 1)

        def partial(batch: pa.Table) -> pa.Table:
            v = transform(_cents(batch["o_totalprice"]))
            v = v[(v >= blo) & (v <= bhi)]
            c = np.bincount((v - blo) // width, minlength=nbins).astype(np.int64)
            return pa.table(
                {"bin": pa.array(np.arange(nbins, dtype=np.int64)), "c": pa.array(c)}
            )

        out = np.zeros(nbins, dtype=np.int64)
        for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None
        ):
            out[np.asarray(b["bin"], dtype=np.int64)] += np.asarray(
                b["c"], dtype=np.int64
            )
        return out, width

    def pull(transform, blo: int, bhi: int):
        def fn(batch: pa.Table) -> pa.Table:
            v = transform(_cents(batch["o_totalprice"]))
            return pa.table({"v": pa.array(v[(v >= blo) & (v <= bhi)])})

        parts = [
            np.asarray(b["v"], dtype=np.int64)
            for b in ds.map_batches(fn, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow", batch_size=None
            )
        ]
        return np.concatenate(parts) if parts else np.array([], dtype=np.int64)

    def kth_smallest(transform, k: int, lo: int, hi: int) -> int:
        rank = k
        blo, bhi = lo, hi
        while True:
            counts, width = hist(transform, blo, bhi)
            cum = np.cumsum(counts)
            bin_i = int(np.searchsorted(cum, rank + 1))
            rank -= int(cum[bin_i - 1]) if bin_i else 0
            b_lo = blo + bin_i * width
            b_hi = min(b_lo + width - 1, bhi)
            if counts[bin_i] > bin_cap and b_hi > b_lo:
                blo, bhi = b_lo, b_hi
                continue
            vals = pull(transform, b_lo, b_hi)
            return int(np.partition(vals, rank)[rank])

    from ray.data.aggregate import Count, Max, Min

    ident = lambda v: v  # noqa: E731
    # bounds pass (distributed aggregate on the cents expression)
    stats = ds.map_batches(
        lambda b: pa.table({"v": pa.array(_cents(b["o_totalprice"]))}),
        batch_format="pyarrow",
    ).aggregate(Min("v"), Max("v"), Count())
    lo, hi, n = int(stats["min(v)"]), int(stats["max(v)"]), int(stats["count()"])

    k = (n - 1) // 2
    med = kth_smallest(ident, k, lo, hi)
    dev = lambda v: np.abs(v - med)  # noqa: E731
    mad = kth_smallest(dev, k, 0, max(hi - med, med - lo))
    return ray.data.from_arrow(
        pa.table(
            {
                "median_cents": pa.array([med], type=pa.int64()),
                "mad_cents": pa.array([mad], type=pa.int64()),
                "n_orders": pa.array([n], type=pa.int64()),
            }
        )
    )


def orders_concurrency_peak(sf_dir: str) -> ray.data.Dataset:
    """Sweep-line temporal concurrency: an order is "active" from its order
    date through its last lineitem ship date; the operator finds the peak
    number of simultaneously active orders and the (earliest) day it is
    reached — the classic interval-overlap maximum, all-integer.

    Distributed shape: (1) per-order last-ship aggregate on lineitem (the
    q4 aggregate-then-join discipline); (2) each order emits two sweep
    events (+1 at o_days, -1 at max_ship+1) pre-summed per batch into
    (day, delta) partials; (3) a days-sized groupby (a few thousand keys)
    collects net deltas; (4) the prefix-sum argmax runs in ONE task over
    the tiny day table (repartition(1)) — the only serial step is
    O(distinct days), never O(orders). Orders with no lineitems count as
    active for their order day alone. Output one row:
    (peak_day, peak_active, n_days)."""
    from ray.data.aggregate import Sum

    from ..stages.joins import hash_join_attach

    per_order = _per_order_max_ship_days(sf_dir)

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )

    def order_days(batch: pa.Table) -> pa.Table:
        days = np.asarray(batch["o_orderdate"], dtype="datetime64[D]").astype(np.int64)
        return pa.table({"o_orderkey": batch["o_orderkey"], "o_days": pa.array(days)})

    joined = hash_join_attach(
        orders.map_batches(order_days, batch_format="pyarrow"),
        "o_orderkey",
        per_order,
        "o_orderkey",
        {"max_days": pa.int64()},
    )

    def sweep_partial(batch: pa.Table) -> pa.Table:
        start = np.asarray(batch["o_days"], dtype=np.int64)
        mx = np.asarray(
            pc.fill_null(batch["max_days"], pa.scalar(np.iinfo(np.int64).min, pa.int64()))
        )
        end = np.maximum(mx, start) + 1  # exclusive; no-lineitem orders end next day
        days = np.concatenate([start, end])
        deltas = np.concatenate(
            [np.ones(len(start), dtype=np.int64), -np.ones(len(end), dtype=np.int64)]
        )
        u, inv = np.unique(days, return_inverse=True)
        net = np.zeros(len(u), dtype=np.int64)
        np.add.at(net, inv, deltas)
        return pa.table({"day": pa.array(u), "delta": pa.array(net)})

    def prefix_argmax(batch: pa.Table) -> pa.Table:
        day = np.asarray(batch["day"], dtype=np.int64)
        delta = np.asarray(batch["delta"], dtype=np.int64)
        order = np.argsort(day, kind="stable")
        day, delta = day[order], delta[order]
        active = np.cumsum(delta)
        best = int(np.argmax(active))  # first maximum -> earliest peak day
        return pa.table(
            {
                "peak_day": pa.array([day[best]]),
                "peak_active": pa.array([active[best]]),
                "n_days": pa.array([np.int64(len(day))]),
            }
        )

    return (
        joined.map_batches(sweep_partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("delta", alias_name="delta"))
        .repartition(1)
        .map_batches(prefix_argmax, batch_format="pyarrow", batch_size=None)
    )


def supplier_hhi(sf_dir: str) -> ray.data.Dataset:
    """Revenue-concentration (Herfindahl-Hirschman) components per nation,
    in exact integer form: per supplier the lineitem revenue accumulates in
    integer hundredths-of-cents, floors to whole dollars (an exact integer
    op both engines replay), and the per-nation output carries
    (n_suppliers, sum_rd, sum_rd2) so the consumer computes
    HHI = sum_rd2 / sum_rd^2 — no float ratio crosses the engine boundary.
    Overflow bound: sum_rd2 ~ n_suppliers * max_dollar_revenue^2 needs
    per-supplier revenue < ~$3B at 1000 suppliers/nation; past that, floor
    to thousands of dollars (same exact-op argument).

    Shape: per-supplier revenue via the bucketed reduce (supplier
    cardinality is corpus-scaled), then the supplier -> nation dimension
    attaches by broadcast sorted-array lookup (dimension tables never
    shuffle; the orders_per_nation discipline), then a <= 25-key generic
    groupby. Output: (n_name, n_suppliers, sum_rd, sum_rd2)."""
    import pyarrow.parquet as pq

    from ray.data.aggregate import Sum

    from ..stages.group_collect import bucketed_sum

    line = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
    )

    def rev_partial(batch: pa.Table) -> pa.Table:
        sk = np.asarray(batch["l_suppkey"], dtype=np.int64)
        price_c = _cents(batch["l_extendedprice"])
        disc = np.round(
            np.asarray(batch["l_discount"], dtype=np.float64) * 100
        ).astype(np.int64)
        rev = price_c * (100 - disc)
        u, inv = np.unique(sk, return_inverse=True)
        acc = np.zeros(len(u), dtype=np.int64)
        np.add.at(acc, inv, rev)
        return pa.table({"l_suppkey": pa.array(u), "r_hc": pa.array(acc)})

    per_supp = bucketed_sum(
        line.map_batches(rev_partial, batch_format="pyarrow"), ["l_suppkey"], ["r_hc"]
    )

    supp = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    sk = np.asarray(supp["s_suppkey"], dtype=np.int64)
    snk = np.asarray(supp["s_nationkey"], dtype=np.int64)
    o = np.argsort(sk)
    nk = np.asarray(nat["n_nationkey"], dtype=np.int64)
    on = np.argsort(nk)
    lookup_ref = ray.put(
        (sk[o], snk[o], nk[on], nat["n_name"].to_numpy(zero_copy_only=False)[on])
    )

    def attach(batch: pa.Table) -> pa.Table:
        sk_s, snk_s, nk_s, nname = bget(lookup_ref)
        k = np.asarray(batch["l_suppkey"], dtype=np.int64)
        nation = snk_s[np.searchsorted(sk_s, k)]  # FK: every suppkey exists
        name = nname[np.searchsorted(nk_s, nation)]
        rd = np.asarray(batch["r_hc"], dtype=np.int64) // np.int64(10_000)
        df = pd.DataFrame({"n_name": name, "rd": rd, "rd2": rd * rd})
        g = df.groupby("n_name", sort=False).agg(
            n=("rd", "size"), sum_rd=("rd", "sum"), sum_rd2=("rd2", "sum")
        ).reset_index()
        return pa.table(
            {
                "n_name": pa.array(g["n_name"].astype(str)),
                "n": pa.array(g["n"].to_numpy().astype(np.int64)),
                "sum_rd": pa.array(g["sum_rd"].to_numpy().astype(np.int64)),
                "sum_rd2": pa.array(g["sum_rd2"].to_numpy().astype(np.int64)),
            }
        )

    return (
        per_supp.map_batches(attach, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(
            Sum("n", alias_name="n_suppliers"),
            Sum("sum_rd", alias_name="sum_rd"),
            Sum("sum_rd2", alias_name="sum_rd2"),
        )
    )


def nation_trade_matrix(sf_dir: str) -> ray.data.Dataset:
    """Revenue matrix between customer nations and supplier nations — the
    trade-flow rollup (TPC-H Q7's shape generalized to the full 25 x 25
    matrix instead of one nation pair). Revenue accumulates in exact
    integer hundredths-of-cents.

    Shape: lineitem is the only big scan; both dimension chains
    (orderkey -> custkey -> nation, suppkey -> nation) broadcast as sorted
    int arrays (orders is ~1/4 the lineitem rows and two int64 columns —
    ~2 MB at sf0.1; at a scale where orders outgrows broadcast, attach the
    customer nation by the partitioned int64 hash join instead, same
    output). Per-batch (cn, sn) partials -> <= 625-key generic groupby
    (bounded, the right tier). Output: (cust_nation, supp_nation,
    revenue_hc)."""
    import pyarrow.parquet as pq

    from ray.data.aggregate import Sum

    orders = pq.read_table(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    supp = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])

    ok = np.asarray(orders["o_orderkey"], dtype=np.int64)
    oc = np.asarray(orders["o_custkey"], dtype=np.int64)
    oo = np.argsort(ok)
    ck = np.asarray(cust["c_custkey"], dtype=np.int64)
    cn = np.asarray(cust["c_nationkey"], dtype=np.int64)
    co = np.argsort(ck)
    sk = np.asarray(supp["s_suppkey"], dtype=np.int64)
    sn = np.asarray(supp["s_nationkey"], dtype=np.int64)
    so = np.argsort(sk)
    # orderkey -> customer nation, resolved once driver-side (all int gathers)
    cust_nation_of_order = cn[co][np.searchsorted(ck[co], oc[oo])]
    lookup_ref = ray.put((ok[oo], cust_nation_of_order, sk[so], sn[so]))
    nk = np.asarray(nat["n_nationkey"], dtype=np.int64)
    no = np.argsort(nk)
    names_ref = ray.put((nk[no], nat["n_name"].to_numpy(zero_copy_only=False)[no]))

    line = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        ok_s, ocn, sk_s, snk = bget(lookup_ref)
        lo = np.asarray(batch["l_orderkey"], dtype=np.int64)
        ls = np.asarray(batch["l_suppkey"], dtype=np.int64)
        cn_b = ocn[np.searchsorted(ok_s, lo)]  # FKs always resolve
        sn_b = snk[np.searchsorted(sk_s, ls)]
        price_c = _cents(batch["l_extendedprice"])
        disc = np.round(
            np.asarray(batch["l_discount"], dtype=np.float64) * 100
        ).astype(np.int64)
        rev = price_c * (100 - disc)
        key = cn_b * np.int64(64) + sn_b  # nationkey < 25
        u, inv = np.unique(key, return_inverse=True)
        acc = np.zeros(len(u), dtype=np.int64)
        np.add.at(acc, inv, rev)
        return pa.table(
            {
                "cn": pa.array(u // 64),
                "sn": pa.array(u % 64),
                "rev": pa.array(acc),
            }
        )

    agg = (
        line.map_batches(partial, batch_format="pyarrow")
        .groupby(["cn", "sn"])
        .aggregate(Sum("rev", alias_name="revenue_hc"))
    )

    def names(batch: pa.Table) -> pa.Table:
        nk_s, nname = bget(names_ref)
        cn_b = np.asarray(batch["cn"], dtype=np.int64)
        sn_b = np.asarray(batch["sn"], dtype=np.int64)
        return pa.table(
            {
                "cust_nation": pa.array(
                    nname[np.searchsorted(nk_s, cn_b)].astype(str)
                ),
                "supp_nation": pa.array(
                    nname[np.searchsorted(nk_s, sn_b)].astype(str)
                ),
                "revenue_hc": batch["revenue_hc"],
            }
        )

    return agg.map_batches(names, batch_format="pyarrow")


def q10_returned_item_revenue(
    sf_dir: str,
    date_lo: str = "1996-01-01",
    date_hi: str = "1996-07-01",
    k: int = 20,
) -> "pd.DataFrame":
    """TPC-H Q10 shape (returned-item reporting): revenue lost to returns
    per customer over one order window, top-k customers.

    Plan (generalizes the reference's aggregate-then-join discipline,
    ``src/query/executor.go`` semantics): lineitem prunes to 4 columns and
    pre-aggregates returned revenue per ORDER inside each batch (integer
    cents) — the big table never shuffles rows, only (orderkey, cents)
    partials through :func:`_bucketed_key_sum`. The windowed orders map
    orderkey -> custkey via one broadcast int-gather (orders is 1:40 of
    lineitem; at real scale swap to hash_join_attach — same output), a
    second bucketed sum rolls up per customer, and customer metadata
    attaches only to the surviving top-k rows driver-side. Deterministic
    tie-break (revenue DESC, c_custkey ASC). Output: (c_custkey, c_name,
    revenue_cents, acctbal_cents, n_name)."""
    import pyarrow.parquet as pq

    lo = np.datetime64(date_lo, "D").astype(np.int64)
    hi = np.datetime64(date_hi, "D").astype(np.int64)

    orders = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )
    odays = np.asarray(orders["o_orderdate"], dtype="datetime64[D]").astype(np.int64)
    win = (odays >= lo) & (odays < hi)
    ok = np.asarray(orders["o_orderkey"], dtype=np.int64)[win]
    oc = np.asarray(orders["o_custkey"], dtype=np.int64)[win]
    so = np.argsort(ok)
    win_ref = ray.put((ok[so], oc[so]))

    line = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    )

    def returned_partial(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch["l_returnflag"], "R")
        okb = np.asarray(batch["l_orderkey"], dtype=np.int64)[np.asarray(keep)]
        price_c = _cents(batch["l_extendedprice"])[np.asarray(keep)]
        disc = np.round(
            np.asarray(batch["l_discount"], dtype=np.float64)[np.asarray(keep)] * 100
        ).astype(np.int64)
        rev = price_c * (100 - disc)  # cents x 100 (exact hundredths of a cent)
        u, inv = np.unique(okb, return_inverse=True)
        acc = np.zeros(len(u), dtype=np.int64)
        np.add.at(acc, inv, rev)
        return pa.table({"k": pa.array(u), "rev": pa.array(acc)})

    per_order = _bucketed_key_sum(
        line.map_batches(returned_partial, batch_format="pyarrow"), "k", ["rev"]
    )

    def to_customer(batch: pa.Table) -> pa.Table:
        ok_s, oc_s = bget(win_ref)
        empty = pa.table({"k": pa.array([], pa.int64()), "rev": pa.array([], pa.int64())})
        if len(ok_s) == 0:  # window matched no orders
            return empty
        kb = np.asarray(batch["k"], dtype=np.int64)
        pos = np.searchsorted(ok_s, kb)
        inside = (pos < len(ok_s)) & (ok_s[np.minimum(pos, len(ok_s) - 1)] == kb)
        cust = oc_s[pos[inside]]
        rev = np.asarray(batch["rev"], dtype=np.int64)[inside]
        u, inv = np.unique(cust, return_inverse=True)
        acc = np.zeros(len(u), dtype=np.int64)
        np.add.at(acc, inv, rev)
        return pa.table({"k": pa.array(u), "rev": pa.array(acc)})

    per_cust = _bucketed_key_sum(
        per_order.map_batches(to_customer, batch_format="pyarrow"), "k", ["rev"]
    )

    # top-k: per-batch partial top-k, tiny driver reduce; ties by custkey asc
    def topk_partial(batch: pa.Table) -> pa.Table:
        kb = np.asarray(batch["k"], dtype=np.int64)
        rev = np.asarray(batch["rev"], dtype=np.int64)
        order = np.lexsort((kb, -rev))[:k]
        return pa.table({"k": pa.array(kb[order]), "rev": pa.array(rev[order])})

    head = per_cust.map_batches(topk_partial, batch_format="pyarrow").to_pandas()
    if head.empty:  # 0-row Dataset drops schema in to_pandas
        head = pd.DataFrame(
            {"k": pd.Series([], dtype=np.int64), "rev": pd.Series([], dtype=np.int64)}
        )
    head = head.sort_values(["rev", "k"], ascending=[False, True]).head(k)

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
    )
    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    ck = np.asarray(cust["c_custkey"], dtype=np.int64)
    cs = np.argsort(ck)
    pos = cs[np.searchsorted(ck[cs], head["k"].to_numpy())]
    nk = np.asarray(nat["n_nationkey"], dtype=np.int64)
    ns = np.argsort(nk)
    cnat = np.asarray(cust["c_nationkey"], dtype=np.int64)[pos]
    out = pd.DataFrame(
        {
            "c_custkey": head["k"].to_numpy(),
            "c_name": cust["c_name"].to_numpy(zero_copy_only=False)[pos].astype(str),
            "revenue_hc": head["rev"].to_numpy(),
            "acctbal_cents": _cents(cust["c_acctbal"])[pos],
            "n_name": nat["n_name"].to_numpy(zero_copy_only=False)[ns][
                np.searchsorted(nk[ns], cnat)
            ].astype(str),
        }
    )
    return out.reset_index(drop=True)


def q13_customer_distribution(
    sf_dir: str, excl_priority: str = "1-URGENT"
) -> ray.data.Dataset:
    """TPC-H Q13 shape (customer distribution): histogram of per-customer
    order counts INCLUDING zero-order customers (the left-join subtlety that
    makes Q13 interesting; the sandbox schema has no comment column, so the
    classic NOT LIKE 'special requests' filter becomes an order-priority
    exclusion).

    Plan: orders prune to (custkey, priority), filter vectorized, count per
    custkey through :func:`_bucketed_key_sum`; customers LEFT-attach their
    count by partitioned int64 hash join (zero-order customers surface as
    null -> 0); the final histogram is a tiny two-column groupby. Output:
    (c_count, custdist)."""
    from ray.data.aggregate import Sum

    from ..stages.joins import hash_join_attach

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    )

    def count_partial(batch: pa.Table) -> pa.Table:
        keep = np.asarray(pc.not_equal(batch["o_orderpriority"], excl_priority))
        cust = np.asarray(batch["o_custkey"], dtype=np.int64)[keep]
        u, counts = np.unique(cust, return_counts=True)
        return pa.table({"k": pa.array(u), "n": pa.array(counts.astype(np.int64))})

    per_cust = _bucketed_key_sum(
        orders.map_batches(count_partial, batch_format="pyarrow"), "k", ["n"]
    )

    cust = read_parquet_sized(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    attached = hash_join_attach(
        cust,
        "c_custkey",
        per_cust.rename_columns({"k": "c_custkey"}),
        "c_custkey",
        {"n": pa.int64()},
    )

    def hist_partial(batch: pa.Table) -> pa.Table:
        n = np.asarray(pc.fill_null(batch["n"], 0), dtype=np.int64)
        u, counts = np.unique(n, return_counts=True)
        return pa.table(
            {"c_count": pa.array(u), "d": pa.array(counts.astype(np.int64))}
        )

    return (
        attached.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("c_count")
        .aggregate(Sum("d", alias_name="custdist"))
    )


def q15_top_supplier(
    sf_dir: str, date_lo: str = "1996-01-01", date_hi: str = "1996-04-01"
) -> "pd.DataFrame":
    """TPC-H Q15 shape (top supplier): revenue per supplier over a quarter,
    return the supplier(s) achieving the global maximum (the classic
    view + scalar-subquery query, decorrelated to max-then-filter).

    Plan: lineitem prunes to 4 columns, per-batch (suppkey, cents) partials
    feed one bucketed sum (suppliers are few, but the pattern is the
    scale-safe one); the global max is a driver reduce over the tiny
    per-supplier table and the name attach touches only winners. Exact
    integer cents make 'equals the max' deterministic — ties all surface,
    ordered by s_suppkey. Output: (s_suppkey, s_name, total_revenue_hc)."""
    import pyarrow.parquet as pq

    lo = np.datetime64(date_lo, "D").astype(np.int64)
    hi = np.datetime64(date_hi, "D").astype(np.int64)

    line = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        days = np.asarray(batch["l_shipdate"], dtype="datetime64[D]").astype(np.int64)
        keep = (days >= lo) & (days < hi)
        sk = np.asarray(batch["l_suppkey"], dtype=np.int64)[keep]
        price_c = _cents(batch["l_extendedprice"])[keep]
        disc = np.round(
            np.asarray(batch["l_discount"], dtype=np.float64)[keep] * 100
        ).astype(np.int64)
        rev = price_c * (100 - disc)
        u, inv = np.unique(sk, return_inverse=True)
        acc = np.zeros(len(u), dtype=np.int64)
        np.add.at(acc, inv, rev)
        return pa.table({"k": pa.array(u), "rev": pa.array(acc)})

    per_supp = _bucketed_key_sum(
        line.map_batches(partial, batch_format="pyarrow"), "k", ["rev"]
    ).to_pandas()
    if per_supp.empty:
        # an empty bucketed-sum Dataset drops its schema in to_pandas —
        # pin the documented columns (same guard class as q10/q17/q22)
        return pd.DataFrame(
            {
                "s_suppkey": np.array([], dtype=np.int64),
                "s_name": np.array([], dtype=object),
                "total_revenue_hc": np.array([], dtype=np.int64),
            }
        )

    best = per_supp["rev"].max()
    winners = per_supp[per_supp["rev"] == best].sort_values("k")

    supp = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"])
    sk = np.asarray(supp["s_suppkey"], dtype=np.int64)
    ss = np.argsort(sk)
    pos = ss[np.searchsorted(sk[ss], winners["k"].to_numpy())]
    return pd.DataFrame(
        {
            "s_suppkey": winners["k"].to_numpy(),
            "s_name": supp["s_name"].to_numpy(zero_copy_only=False)[pos].astype(str),
            "total_revenue_hc": winners["rev"].to_numpy(),
        }
    ).reset_index(drop=True)


def q17_small_quantity_revenue(
    sf_dir: str, brands: tuple[str, ...] = ("Brand#11", "Brand#12")
) -> "pd.DataFrame":
    """TPC-H Q17 shape (small-quantity-order revenue): total price of
    lineitems whose quantity is below 20% of the part's average quantity,
    over a brand subset (the sandbox schema has no container column).

    The correlated scalar subquery AVG(l_quantity) decorrelates to one
    per-part (sum_qty, n) pass; the comparison clears the denominator —
    5 * qty * n < sum_qty — so both engines compare exact integers (the
    synthetic quantities are whole numbers; ROUND guards regardless).
    Plan: brand part-keys broadcast (tiny), lineitem prunes to 3 columns
    and passes twice (sum/count partials, then the filtered revenue sum) —
    two streaming passes, no row shuffle at all. Output: one row
    (avg_yearly_hc = total cents-x-100 of qualifying lineitems)."""
    import pyarrow.parquet as pq

    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"])
    brand_mask = np.isin(part["p_brand"].to_numpy(zero_copy_only=False), list(brands))
    pkeys = np.sort(np.asarray(part["p_partkey"], dtype=np.int64)[brand_mask])
    pk_ref = ray.put(pkeys)

    line = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )

    def in_brand(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        pk = bget(pk_ref)
        lp = np.asarray(batch["l_partkey"], dtype=np.int64)
        if len(pk) == 0:  # no part carries the brand subset
            return lp, np.zeros(len(lp), dtype=bool)
        pos = np.searchsorted(pk, lp)
        hit = (pos < len(pk)) & (pk[np.minimum(pos, len(pk) - 1)] == lp)
        return lp, hit

    def qty_partial(batch: pa.Table) -> pa.Table:
        lp, hit = in_brand(batch)
        qty = np.round(np.asarray(batch["l_quantity"], dtype=np.float64)[hit]).astype(
            np.int64
        )
        u, inv = np.unique(lp[hit], return_inverse=True)
        s = np.zeros(len(u), dtype=np.int64)
        c = np.zeros(len(u), dtype=np.int64)
        np.add.at(s, inv, qty)
        np.add.at(c, inv, 1)
        return pa.table({"k": pa.array(u), "s": pa.array(s), "c": pa.array(c)})

    per_part = _bucketed_key_sum(
        line.map_batches(qty_partial, batch_format="pyarrow"), "k", ["s", "c"]
    ).to_pandas()
    if per_part.empty:  # 0-row Dataset drops schema in to_pandas
        z = np.array([], dtype=np.int64)
        stats_ref = ray.put((z, z, z))
    else:
        ppk = per_part["k"].to_numpy()
        order = np.argsort(ppk)
        stats_ref = ray.put(
            (ppk[order], per_part["s"].to_numpy()[order], per_part["c"].to_numpy()[order])
        )

    def rev_partial(batch: pa.Table) -> pa.Table:
        pk_s, sum_q, n_q = bget(stats_ref)
        lp, hit = in_brand(batch)
        if not hit.any():
            return pa.table({"rev": pa.array([np.int64(0)])})
        lp_h = lp[hit]
        qty = np.round(np.asarray(batch["l_quantity"], dtype=np.float64)[hit]).astype(
            np.int64
        )
        price_c = _cents(batch["l_extendedprice"])[hit]
        pos = np.searchsorted(pk_s, lp_h)
        small = 5 * qty * n_q[pos] < sum_q[pos]
        return pa.table({"rev": pa.array([np.int64(price_c[small].sum())])})

    total = (
        line.map_batches(rev_partial, batch_format="pyarrow")
        .sum("rev")
    )
    return pd.DataFrame({"total_small_qty_cents": [np.int64(total)]})


def q22_global_sales_opportunity(
    sf_dir: str, nationkeys: tuple[int, ...] = (1, 3, 5, 7, 9, 11, 13)
) -> "pd.DataFrame":
    """TPC-H Q22 shape (global sales opportunity): customers from a nation
    subset (stand-in for the classic phone-prefix filter) whose balance
    exceeds the average POSITIVE balance of that subset and who have no
    URGENT orders (NOT EXISTS restricted to o_orderpriority='1-URGENT' —
    a deliberate variation so the anti-join side is selective; the SQL twin
    applies the same restriction), rolled up per nation.

    Two decorrelations in one query: the scalar AVG broadcasts as the
    cleared-denominator pair (sum_cents, n) so the comparison
    bal_c * n > sum_c is integer-exact, and NOT EXISTS(orders) is an
    anti-join — custkeys with any order attach a flag via partitioned int64
    hash join and survivors are the nulls. Customer is the small table but
    both sides stream; nothing beyond the 2-int scalar broadcasts. Output:
    (c_nationkey, numcust, totacctbal_cents)."""
    from ray.data.aggregate import Sum

    from ..stages.joins import hash_join_attach

    cust = read_parquet_sized(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey", "c_acctbal"]
    )
    nk = np.array(sorted(nationkeys), dtype=np.int64)

    def subset(batch: pa.Table) -> pa.Table:
        cn = np.asarray(batch["c_nationkey"], dtype=np.int64)
        keep = np.isin(cn, nk)
        return pa.table(
            {
                "c_custkey": pa.array(np.asarray(batch["c_custkey"], dtype=np.int64)[keep]),
                "c_nationkey": pa.array(cn[keep]),
                "bal_c": pa.array(_cents(batch["c_acctbal"])[keep]),
            }
        )

    sub = cust.map_batches(subset, batch_format="pyarrow").materialize()

    def avg_partial(batch: pa.Table) -> pa.Table:
        bal = np.asarray(batch["bal_c"], dtype=np.int64)
        pos = bal > 0
        return pa.table(
            {
                "s": pa.array([np.int64(bal[pos].sum())]),
                "n": pa.array([np.int64(pos.sum())]),
            }
        )

    stats = sub.map_batches(avg_partial, batch_format="pyarrow").to_pandas().sum()
    sum_c, n_pos = np.int64(stats["s"]), np.int64(stats["n"])

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    )

    def order_flag(batch: pa.Table) -> pa.Table:
        urgent = np.asarray(pc.equal(batch["o_orderpriority"], "1-URGENT"))
        u = np.unique(np.asarray(batch["o_custkey"], dtype=np.int64)[urgent])
        return pa.table({"k": pa.array(u), "f": pa.array(np.ones(len(u), np.int64))})

    # per-custkey dedup first (bucketed max==presence), then the anti-attach
    has_order = _bucketed_key_sum(
        orders.map_batches(order_flag, batch_format="pyarrow"), "k", ["f"]
    )

    def above_avg(batch: pa.Table) -> pa.Table:
        bal = np.asarray(batch["bal_c"], dtype=np.int64)
        return batch.filter(pa.array(bal * n_pos > sum_c))

    attached = hash_join_attach(
        sub.map_batches(above_avg, batch_format="pyarrow"),
        "c_custkey",
        has_order.rename_columns({"k": "c_custkey"}),
        "c_custkey",
        {"f": pa.int64()},
    )

    def roll(batch: pa.Table) -> pa.Table:
        no_order = np.asarray(pc.is_null(batch["f"]))
        cn = np.asarray(batch["c_nationkey"], dtype=np.int64)[no_order]
        bal = np.asarray(batch["bal_c"], dtype=np.int64)[no_order]
        u, inv = np.unique(cn, return_inverse=True)
        nsum = np.zeros(len(u), dtype=np.int64)
        cnt = np.zeros(len(u), dtype=np.int64)
        np.add.at(nsum, inv, bal)
        np.add.at(cnt, inv, 1)
        return pa.table(
            {"c_nationkey": pa.array(u), "nc": pa.array(cnt), "tb": pa.array(nsum)}
        )

    out = (
        attached.map_batches(roll, batch_format="pyarrow")
        .groupby("c_nationkey")
        .aggregate(Sum("nc", alias_name="numcust"), Sum("tb", alias_name="totacctbal_cents"))
        .to_pandas()
    )
    if out.empty:
        # a 0-row Ray Dataset drops its schema in to_pandas (same class as
        # heavy_hitter_users); at tiny scale every subset customer can have
        # orders, so pin the columns explicitly
        out = pd.DataFrame(
            {
                "c_nationkey": pd.Series([], dtype=np.int64),
                "numcust": pd.Series([], dtype=np.int64),
                "totacctbal_cents": pd.Series([], dtype=np.int64),
            }
        )
    return out


def q2_cheapest_supplier(
    sf_dir: str, brands: tuple[str, ...] = ("Brand#21", "Brand#22")
) -> "pd.DataFrame":
    """TPC-H Q2 shape (minimum-cost supplier): for every part in a brand
    subset, the supplier(s) achieving the minimum historical unit price —
    the correlated MIN subquery decorrelated to aggregate-then-equality-join
    (the sandbox has no partsupp table, so lineitem's unit prices stand in
    for supplycost).

    Exactness: unit price = price_cents * 1000 // quantity (integer FLOOR
    division, identical in numpy and DuckDB's ``//``) — no float rounding
    to diverge on ties, and argmin ties surface as multiple rows exactly
    like the classic Q2. Plan: brand part-keys broadcast; two chained
    bucketed MIN reduces ((part, supp) then part); the per-part minimum
    re-attaches by partitioned int64 hash join and equality filters the
    winners; supplier/part metadata gathers driver-side for winners only.
    Output: (p_partkey, p_brand, s_suppkey, s_name, best_unit_mc)."""
    import pyarrow.parquet as pq

    from ..stages.group_collect import bucketed_reduce
    from ..stages.joins import hash_join_attach

    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"])
    brand_mask = np.isin(part["p_brand"].to_numpy(zero_copy_only=False), list(brands))
    pk = np.asarray(part["p_partkey"], dtype=np.int64)[brand_mask]
    pbrand = part["p_brand"].to_numpy(zero_copy_only=False)[brand_mask].astype(str)
    order = np.argsort(pk)
    if len(pk) == 0:
        # no part matches the brand subset: the downstream per_ps dataset
        # would be empty and schema-less (hash_join_attach then fails on a
        # None schema) — early-return the documented empty frame instead
        return pd.DataFrame(
            {
                "p_partkey": np.array([], dtype=np.int64),
                "p_brand": np.array([], dtype=object),
                "s_suppkey": np.array([], dtype=np.int64),
                "s_name": np.array([], dtype=object),
                "best_unit_mc": np.array([], dtype=np.int64),
            }
        )
    pk_ref = ray.put(pk[order])

    line = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"],
    )

    def unit_partial(batch: pa.Table) -> pa.Table:
        pks = bget(pk_ref)
        lp = np.asarray(batch["l_partkey"], dtype=np.int64)
        if len(pks) == 0:
            hit = np.zeros(len(lp), dtype=bool)
        else:
            pos = np.searchsorted(pks, lp)
            hit = (pos < len(pks)) & (pks[np.minimum(pos, len(pks) - 1)] == lp)
        lp = lp[hit]
        ls = np.asarray(batch["l_suppkey"], dtype=np.int64)[hit]
        qty = np.round(np.asarray(batch["l_quantity"], dtype=np.float64)[hit]).astype(np.int64)
        unit = _cents(batch["l_extendedprice"])[hit] * 1000 // qty
        # within-batch pre-reduce per (part, supp)
        key = lp * np.int64(1 << 20) + ls  # suppkey < 2^20 at every SF here
        u, inv = np.unique(key, return_inverse=True)
        m = np.full(len(u), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(m, inv, unit)
        return pa.table(
            {
                "pkey": pa.array(u >> 20),
                "skey": pa.array(u & ((1 << 20) - 1)),
                "unit_mc": pa.array(m),
            }
        )

    per_ps = bucketed_reduce(
        line.map_batches(unit_partial, batch_format="pyarrow"),
        ["pkey", "skey"],
        {"unit_mc": "min"},
    ).materialize()
    if per_ps.count() == 0:
        # brand parts exist but no lineitem references them: per_ps is a
        # schema-less empty dataset and hash_join_attach would fail on a
        # None schema — same empty contract as the len(pk)==0 guard above
        return pd.DataFrame(
            {
                "p_partkey": np.array([], dtype=np.int64),
                "p_brand": np.array([], dtype=object),
                "s_suppkey": np.array([], dtype=np.int64),
                "s_name": np.array([], dtype=object),
                "best_unit_mc": np.array([], dtype=np.int64),
            }
        )

    per_part = bucketed_reduce(per_ps, ["pkey"], {"unit_mc": "min"}).map_batches(
        lambda b: pa.table({"pkey": b["pkey"], "best_mc": b["unit_mc"]}),
        batch_format="pyarrow",
    )

    joined = hash_join_attach(per_ps, "pkey", per_part, "pkey", {"best_mc": pa.int64()})

    def winners(batch: pa.Table) -> pa.Table:
        keep = np.asarray(batch["unit_mc"], dtype=np.int64) == np.asarray(
            pc.fill_null(batch["best_mc"], np.iinfo(np.int64).max), dtype=np.int64
        )
        return batch.filter(pa.array(keep)).select(["pkey", "skey", "unit_mc"])

    won = joined.map_batches(winners, batch_format="pyarrow").to_pandas()

    supp = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"])
    sk = np.asarray(supp["s_suppkey"], dtype=np.int64)
    ss = np.argsort(sk)
    spos = ss[np.searchsorted(sk[ss], won["skey"].to_numpy())]
    ppos = np.searchsorted(pk[order], won["pkey"].to_numpy())
    out = pd.DataFrame(
        {
            "p_partkey": won["pkey"].to_numpy(),
            "p_brand": pbrand[order][ppos],
            "s_suppkey": won["skey"].to_numpy(),
            "s_name": supp["s_name"].to_numpy(zero_copy_only=False)[spos].astype(str),
            "best_unit_mc": won["unit_mc"].to_numpy(),
        }
    )
    return out.sort_values(["p_partkey", "s_suppkey"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Round-4 additions: the remaining TPC-H decorrelation shapes (Q8, Q9, Q11,
# Q16, Q19, Q20, Q21), adapted to the columns the sandbox tables carry (no
# partsupp, no receipt/commit dates, no container/shipmode) — the point is
# each query's DISTRIBUTED SHAPE (market-share ratio aggregate, multi-dim
# profit rollup, global-threshold HAVING subquery, count-distinct with an
# anti-join, disjunctive predicate scan, aggregate-gated semi-join, and the
# exists/not-exists double correlation), not spec fidelity. With q1-q6,
# q10, q12-q15, q17, q18, q22 and nation_trade_matrix (q7), every one of
# the 22 TPC-H shapes now has a Ray pipeline + exact integer oracle.
# ---------------------------------------------------------------------------


def _part_keys_where(sf_dir: str, mask_fn) -> np.ndarray:
    """Sorted int64 partkeys passing a vectorized predicate over the part
    table. The part DIMENSION is broadcast-sized relative to lineitem at
    every TPC-H scale (SF*200k rows vs SF*6M); filtered subsets are smaller
    still — same small-side-broadcast call the q17/q2 shapes make."""
    import pyarrow.parquet as pq

    part = pq.read_table(f"{sf_dir}/part.parquet")
    keep = mask_fn(part)
    return np.sort(np.asarray(part["p_partkey"], dtype=np.int64)[keep])


def _sorted_member_mask(sorted_keys: np.ndarray, probe: np.ndarray) -> np.ndarray:
    if len(sorted_keys) == 0:
        return np.zeros(len(probe), dtype=bool)
    pos = np.clip(np.searchsorted(sorted_keys, probe), 0, len(sorted_keys) - 1)
    return sorted_keys[pos] == probe


def _year_of(col) -> np.ndarray:
    d = np.asarray(col, dtype="datetime64[Y]")
    return d.astype(np.int64) + 1970


def q8_market_share(
    sf_dir: str,
    region: str = "ASIA",
    p_type: str = "STANDARD",
    nation_key: int = 19,
    date_lo: str = "1995-01-01",
    date_hi: str = "1997-01-01",
) -> ray.data.Dataset:
    """TPC-H Q8 shape: one nation's share of regional order volume for one
    part type, per order year. The share is returned as its two exact
    integer components (numerator/denominator in hundredths-of-cents) so the
    distributed sum order cannot perturb a float division.

    Plan: part-type keys and the supplier->nation map broadcast; orders
    (date-windowed) x customer is partitioned hash join #1 with the region
    filter applied map-side right after the attach; lineitem (pre-filtered
    by the broadcast part set BEFORE its shuffle) x the order/year table is
    hash join #2; numerator/denominator partials reduce per batch so the
    final groupby moves only per-year pairs."""
    import pyarrow.parquet as pq

    from ray.data.aggregate import Sum

    from ..stages.joins import hash_join_attach

    pk = _part_keys_where(
        sf_dir, lambda t: np.asarray(t["p_type"].to_pandas() == p_type)
    )
    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    reg = pq.read_table(f"{sf_dir}/region.parquet")
    rkeys = {
        r["r_regionkey"] for r in reg.to_pylist() if r["r_name"] == region
    }
    region_nations = np.sort(
        np.asarray(
            [r["n_nationkey"] for r in nat.to_pylist() if r["n_regionkey"] in rkeys],
            dtype=np.int64,
        )
    )
    sup = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    s_keys = np.asarray(sup["s_suppkey"], dtype=np.int64)
    s_nat = np.asarray(sup["s_nationkey"], dtype=np.int64)
    so = np.argsort(s_keys)
    ref = ray.put((pk, region_nations, s_keys[so], s_nat[so]))

    lo, hi = np.datetime64(date_lo), np.datetime64(date_hi)
    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def filter_orders(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch["o_orderdate"], dtype="datetime64[D]")
        keep = (d >= lo) & (d < hi)
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"].filter(pa.array(keep)),
                "o_custkey": batch["o_custkey"].filter(pa.array(keep)),
                "o_year": pa.array(_year_of(batch["o_orderdate"])[keep], type=pa.int64()),
            }
        )

    orders_f = orders.map_batches(filter_orders, batch_format="pyarrow")
    customer = read_parquet_sized(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    orders_cn = hash_join_attach(
        orders_f, "o_custkey", customer, "c_custkey", {"c_nationkey": pa.int32()}
    )

    def regional(batch: pa.Table) -> pa.Table:
        _pk, rn, _sk, _sn = bget(ref)
        cn = np.asarray(batch["c_nationkey"].combine_chunks().fill_null(-1), dtype=np.int64)
        keep = _sorted_member_mask(rn, cn)
        return batch.select(["o_orderkey", "o_year"]).filter(pa.array(keep))

    orders_r = orders_cn.map_batches(regional, batch_format="pyarrow")

    lineitem = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def li_filter(batch: pa.Table) -> pa.Table:
        _pk, _rn, _sk, _sn = bget(ref)
        keep = _sorted_member_mask(_pk, np.asarray(batch["l_partkey"], dtype=np.int64))
        price_c = _cents(batch["l_extendedprice"])[keep]
        disc = np.round(
            np.asarray(batch["l_discount"], dtype=np.float64)[keep] * 100
        ).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"].filter(pa.array(keep)),
                "l_suppkey": batch["l_suppkey"].filter(pa.array(keep)),
                "v_hc": pa.array(price_c * (100 - disc), type=pa.int64()),
            }
        )

    li = lineitem.map_batches(li_filter, batch_format="pyarrow")
    joined = hash_join_attach(li, "l_orderkey", orders_r, "o_orderkey", {"o_year": pa.int64()})

    def partial(batch: pa.Table) -> pa.Table:
        _pk, _rn, sk, sn = bget(ref)
        yr_col = batch["o_year"].combine_chunks()
        valid = ~np.asarray(yr_col.is_null())
        if not valid.any():
            return pa.table(
                {
                    "o_year": pa.array([], type=pa.int64()),
                    "share_num_hc": pa.array([], type=pa.int64()),
                    "share_den_hc": pa.array([], type=pa.int64()),
                }
            )
        yr = np.asarray(yr_col.fill_null(-1), dtype=np.int64)[valid]
        lsk = np.asarray(batch["l_suppkey"], dtype=np.int64)[valid]
        v = np.asarray(batch["v_hc"], dtype=np.int64)[valid]
        pos = np.clip(np.searchsorted(sk, lsk), 0, len(sk) - 1)
        hit = sk[pos] == lsk
        # inner-join semantics (match the SQL twin): a lineitem whose
        # suppkey has no supplier row is excluded from BOTH components,
        # not counted in the denominator with an unknown nation
        yr, v = yr[hit], v[hit]
        sup_nat = sn[pos][hit]
        num = np.where(sup_nat == nation_key, v, 0)
        df = (
            pd.DataFrame({"o_year": yr, "share_num_hc": num, "share_den_hc": v})
            .groupby("o_year", as_index=False)
            .sum()
        )
        return pa.Table.from_pandas(df, preserve_index=False).cast(
            pa.schema(
                [
                    ("o_year", pa.int64()),
                    ("share_num_hc", pa.int64()),
                    ("share_den_hc", pa.int64()),
                ]
            )
        )

    return (
        joined.map_batches(partial, batch_format="pyarrow")
        .repartition(4)
        .groupby("o_year")
        .aggregate(
            Sum("share_num_hc", alias_name="share_num_hc"),
            Sum("share_den_hc", alias_name="share_den_hc"),
        )
    )


def q9_product_profit(sf_dir: str, name_sub: str = "rod") -> ray.data.Dataset:
    """TPC-H Q9 shape (no partsupp in the sandbox tables, so profit is the
    discounted revenue rather than revenue minus supply cost): per
    (supplier nation, order year) profit over lineitems of parts whose name
    contains ``name_sub``. Broadcast part-name keys prune lineitem BEFORE
    its only shuffle (the orderkey hash join that attaches the year);
    supplier->nation-name is a broadcast gather; the final groupby carries
    ~nations x years rows."""
    import pyarrow.parquet as pq

    from ray.data.aggregate import Sum

    from ..stages.joins import hash_join_attach

    pk = _part_keys_where(
        sf_dir,
        lambda t: t["p_name"].to_pandas().str.contains(name_sub, regex=False).to_numpy(),
    )
    sup = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    names = {r["n_nationkey"]: r["n_name"] for r in nat.to_pylist()}
    s_keys = np.asarray(sup["s_suppkey"], dtype=np.int64)
    s_nat = np.asarray(sup["s_nationkey"], dtype=np.int64)
    so = np.argsort(s_keys)
    ref = ray.put((pk, s_keys[so], s_nat[so], names))

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )

    def order_years(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "o_year": pa.array(_year_of(batch["o_orderdate"]), type=pa.int64()),
            }
        )

    oy = orders.map_batches(order_years, batch_format="pyarrow")

    lineitem = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def li_filter(batch: pa.Table) -> pa.Table:
        _pk, _sk, _sn, _names = bget(ref)
        keep = _sorted_member_mask(_pk, np.asarray(batch["l_partkey"], dtype=np.int64))
        price_c = _cents(batch["l_extendedprice"])[keep]
        disc = np.round(
            np.asarray(batch["l_discount"], dtype=np.float64)[keep] * 100
        ).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"].filter(pa.array(keep)),
                "l_suppkey": batch["l_suppkey"].filter(pa.array(keep)),
                "v_hc": pa.array(price_c * (100 - disc), type=pa.int64()),
            }
        )

    li = lineitem.map_batches(li_filter, batch_format="pyarrow")
    joined = hash_join_attach(li, "l_orderkey", oy, "o_orderkey", {"o_year": pa.int64()})

    def partial(batch: pa.Table) -> pa.Table:
        _pk, sk, sn, nm = bget(ref)
        yr_col = batch["o_year"].combine_chunks()
        valid = ~np.asarray(yr_col.is_null())
        if not valid.any():
            return pa.table(
                {
                    "n_name": pa.array([], type=pa.string()),
                    "o_year": pa.array([], type=pa.int64()),
                    "profit_hc": pa.array([], type=pa.int64()),
                }
            )
        yr = np.asarray(yr_col.fill_null(-1), dtype=np.int64)[valid]
        lsk = np.asarray(batch["l_suppkey"], dtype=np.int64)[valid]
        v = np.asarray(batch["v_hc"], dtype=np.int64)[valid]
        pos = np.clip(np.searchsorted(sk, lsk), 0, len(sk) - 1)
        nk = np.where(sk[pos] == lsk, sn[pos], -2)
        df = (
            pd.DataFrame({"nk": nk, "o_year": yr, "profit_hc": v})
            .groupby(["nk", "o_year"], as_index=False)
            .sum()
        )
        df = df[df["nk"].isin(nm)]
        return pa.table(
            {
                "n_name": pa.array([nm[k] for k in df["nk"]], type=pa.string()),
                "o_year": pa.array(df["o_year"].to_numpy(), type=pa.int64()),
                "profit_hc": pa.array(df["profit_hc"].to_numpy(), type=pa.int64()),
            }
        )

    return (
        joined.map_batches(partial, batch_format="pyarrow")
        .repartition(4)
        .groupby(["n_name", "o_year"])
        .aggregate(Sum("profit_hc", alias_name="profit_hc"))
    )


def q11_important_parts(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q11 shape: per-key value sums kept only where the key's value
    beats a GLOBAL scalar-subquery threshold (here 1.5x the mean per-part
    value, in exact integer cross-multiplied form: value*2*n > 3*total —
    scale-free where Q11's fixed fraction empties at larger SF). One
    bucketed shuffle builds the per-part sums; the threshold is two scalar
    aggregates off the SAME materialized per-part table (no second scan of
    lineitem); the filter is a map-side mask."""
    from ..stages.group_collect import bucketed_sum

    per_part = bucketed_sum(
        read_parquet_sized(
            f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_extendedprice"]
        ).map_batches(
            lambda b: pa.table(
                {
                    "l_partkey": b["l_partkey"],
                    "value_c": pa.array(_cents(b["l_extendedprice"]), type=pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ),
        ["l_partkey"],
        ["value_c"],
    ).materialize()
    total = per_part.sum("value_c")
    n = per_part.count()
    if total is None or n == 0:
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "l_partkey": pa.array([], type=pa.int64()),
                    "value_c": pa.array([], type=pa.int64()),
                }
            )
        )

    def keep(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch["value_c"], dtype=np.int64)
        return batch.filter(pa.array(v * 2 * n > 3 * total))

    return per_part.map_batches(keep, batch_format="pyarrow")


def q16_supplier_part_census(
    sf_dir: str,
    exclude_brand: str = "Brand#13",
    exclude_type: str = "PROMO",
    sizes: tuple[int, ...] = (1, 4, 9, 16, 25, 36, 49),
    complaint_acctbal: float = 1000.0,
) -> ray.data.Dataset:
    """TPC-H Q16 shape: COUNT(DISTINCT supplier) per part-attribute combo,
    minus an anti-joined supplier blocklist (no s_comment column, so the
    'complaints' stand-in is s_acctbal < threshold). Part attrs are
    factorized driver-side into dense combo ids (part is the broadcast-sized
    dimension); lineitem emits batch-deduped (combo, suppkey) pairs; one
    bucketed DISTINCT then a bucketed count per combo — the corpus-scaled
    table never shuffles its payload, only int64 pairs."""
    import pyarrow.parquet as pq

    from ..stages.group_collect import bucketed_distinct, bucketed_sum

    part = pq.read_table(f"{sf_dir}/part.parquet")
    brand = part["p_brand"].to_pandas()
    ptype = part["p_type"].to_pandas()
    psize = np.asarray(part["p_size"], dtype=np.int64)
    keep = (
        (brand != exclude_brand).to_numpy()
        & (ptype != exclude_type).to_numpy()
        & np.isin(psize, np.asarray(sizes, dtype=np.int64))
    )
    pkeys = np.asarray(part["p_partkey"], dtype=np.int64)[keep]
    combos = pd.DataFrame(
        {"p_brand": brand[keep].to_numpy(), "p_type": ptype[keep].to_numpy(), "p_size": psize[keep]}
    )
    combo_id, uniq = pd.factorize(
        pd.Series(zip(combos["p_brand"], combos["p_type"], combos["p_size"]))
    )
    order = np.argsort(pkeys)
    ref = ray.put((pkeys[order], combo_id[order].astype(np.int64)))

    bad = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_acctbal"])
    bad_keys = np.sort(
        np.asarray(bad["s_suppkey"], dtype=np.int64)[
            np.asarray(bad["s_acctbal"], dtype=np.float64) < complaint_acctbal
        ]
    )
    bad_ref = ray.put(bad_keys)

    lineitem = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    )

    def pairs(batch: pa.Table) -> pa.Table:
        pk, cid = bget(ref)
        lpk = np.asarray(batch["l_partkey"], dtype=np.int64)
        lsk = np.asarray(batch["l_suppkey"], dtype=np.int64)
        m = _sorted_member_mask(pk, lpk) & ~_sorted_member_mask(bget(bad_ref), lsk)
        pos = np.searchsorted(pk, lpk[m])
        both = np.unique(  # batch-level pre-dedup cuts the shuffle volume
            np.stack([cid[pos], lsk[m]], axis=1), axis=0
        )
        return pa.table(
            {
                "combo": pa.array(both[:, 0] if len(both) else [], type=pa.int64()),
                "supp": pa.array(both[:, 1] if len(both) else [], type=pa.int64()),
            }
        )

    distinct_pairs = bucketed_distinct(
        lineitem.map_batches(pairs, batch_format="pyarrow"), ["combo", "supp"]
    ).map_batches(
        lambda b: pa.table(
            {"combo": b["combo"], "supplier_cnt": pa.array(np.ones(len(b), dtype=np.int64))}
        ),
        batch_format="pyarrow",
    )
    counts = bucketed_sum(distinct_pairs, ["combo"], ["supplier_cnt"])

    u_brand = pa.array([u[0] for u in uniq], type=pa.string())
    u_type = pa.array([u[1] for u in uniq], type=pa.string())
    u_size = pa.array([int(u[2]) for u in uniq], type=pa.int64())
    attrs_ref = ray.put((u_brand, u_type, u_size))

    def attach(batch: pa.Table) -> pa.Table:
        ub, ut, us = bget(attrs_ref)
        idx = pa.array(np.asarray(batch["combo"], dtype=np.int64))
        return pa.table(
            {
                "p_brand": ub.take(idx),
                "p_type": ut.take(idx),
                "p_size": us.take(idx),
                "supplier_cnt": batch["supplier_cnt"],
            }
        )

    return counts.map_batches(attach, batch_format="pyarrow")


def q19_disjunctive_revenue(
    sf_dir: str,
    clauses: tuple[tuple[str, int, int, int, int], ...] = (
        ("Brand#12", 1, 15, 1, 21),
        ("Brand#23", 1, 25, 10, 30),
        ("Brand#34", 1, 35, 20, 40),
    ),
) -> pd.DataFrame:
    """TPC-H Q19 shape: revenue under an OR of three (brand, size-range,
    quantity-range) conjunct groups — the disjunctive-predicate scan. Part
    attrs gather through one broadcast sorted array; the whole disjunction
    is a vectorized mask; the driver sees one integer per batch. Each clause
    is (brand, size_lo, size_hi, qty_lo, qty_hi)."""
    import pyarrow.parquet as pq

    from ray.data.aggregate import Sum

    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"])
    pkeys = np.asarray(part["p_partkey"], dtype=np.int64)
    order = np.argsort(pkeys)
    brands = pd.factorize(part["p_brand"].to_pandas())
    brand_code = {b: i for i, b in enumerate(brands[1])}
    ref = ray.put(
        (
            pkeys[order],
            brands[0][order].astype(np.int64),
            np.asarray(part["p_size"], dtype=np.int64)[order],
            tuple(
                (brand_code.get(b, -1), slo, shi, qlo, qhi)
                for b, slo, shi, qlo, qhi in clauses
            ),
        )
    )

    lineitem = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        pk, pb, ps, cls = bget(ref)
        lpk = np.asarray(batch["l_partkey"], dtype=np.int64)
        pos = np.clip(np.searchsorted(pk, lpk), 0, len(pk) - 1)
        hit = pk[pos] == lpk
        b = np.where(hit, pb[pos], -9)
        s = np.where(hit, ps[pos], -9)
        q = np.asarray(batch["l_quantity"], dtype=np.int64)
        m = np.zeros(len(batch), dtype=bool)
        for bc, slo, shi, qlo, qhi in cls:
            m |= (b == bc) & (s >= slo) & (s <= shi) & (q >= qlo) & (q <= qhi)
        price_c = _cents(batch["l_extendedprice"])[m]
        disc = np.round(
            np.asarray(batch["l_discount"], dtype=np.float64)[m] * 100
        ).astype(np.int64)
        rev = int((price_c * (100 - disc)).sum())
        return pa.table({"revenue_hc": pa.array([rev], type=pa.int64())})

    agg = lineitem.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("revenue_hc", alias_name="revenue_hc")
    )
    return pd.DataFrame([{"revenue_hc": agg["revenue_hc"]}])


def q20_promotion_suppliers(
    sf_dir: str,
    name_prefix: str = "cold",
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
    min_qty: int = 50,
) -> ray.data.Dataset:
    """TPC-H Q20 shape: suppliers whose aggregate shipped quantity of a
    part-name family inside a date window beats a threshold — the
    aggregate-gated semi-join (no partsupp availqty, so the gate is a fixed
    threshold). Broadcast part-prefix keys prune lineitem map-side; ONE
    bucketed per-supplier sum; the supplier dimension attaches by broadcast
    gather. Output: (s_name, total_qty)."""
    import pyarrow.parquet as pq

    from ..stages.group_collect import bucketed_sum

    pk = _part_keys_where(
        sf_dir,
        lambda t: t["p_name"].to_pandas().str.startswith(name_prefix).to_numpy(),
    )
    ref = ray.put(pk)
    lo, hi = np.datetime64(date_lo), np.datetime64(date_hi)

    lineitem = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
    )

    def prune(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch["l_shipdate"], dtype="datetime64[D]")
        keep = (
            _sorted_member_mask(bget(ref), np.asarray(batch["l_partkey"], dtype=np.int64))
            & (d >= lo)
            & (d < hi)
        )
        return pa.table(
            {
                "l_suppkey": batch["l_suppkey"].filter(pa.array(keep)),
                "total_qty": pa.array(
                    np.asarray(batch["l_quantity"], dtype=np.int64)[keep], type=pa.int64()
                ),
            }
        )

    per_supp = bucketed_sum(
        lineitem.map_batches(prune, batch_format="pyarrow"), ["l_suppkey"], ["total_qty"]
    )

    supp = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"])
    sk = np.asarray(supp["s_suppkey"], dtype=np.int64)
    so = np.argsort(sk)
    names_ref = ray.put((sk[so], supp["s_name"].take(pa.array(so))))

    def gate(batch: pa.Table) -> pa.Table:
        sk_s, nm = bget(names_ref)
        q = np.asarray(batch["total_qty"], dtype=np.int64)
        keep = q > min_qty
        ks = np.asarray(batch["l_suppkey"], dtype=np.int64)[keep]
        pos = np.searchsorted(sk_s, ks)
        return pa.table(
            {
                "s_name": nm.take(pa.array(pos)),
                "total_qty": pa.array(q[keep], type=pa.int64()),
            }
        )

    return per_supp.map_batches(gate, batch_format="pyarrow")


def q21_waiting_suppliers(sf_dir: str, late_days: int = 60) -> ray.data.Dataset:
    """TPC-H Q21 shape: for finalized orders served by >= 2 suppliers where
    EXACTLY ONE supplier shipped late, count waiting incidents per late
    supplier — the exists/not-exists double correlation. No
    receipt/commit dates in the sandbox tables, so 'late' is l_shipdate >
    o_orderdate + late_days.

    Plan: orders(status F) hash-joins its orderdate onto lineitem (the one
    corpus-scaled exchange); pair lateness reduces per (order, supplier)
    with a bucketed MAX; per-order counts reduce with a bucketed SUM whose
    sum(s*late) recovers the single late supplier arithmetically when
    n_late == 1 (no argmax machinery); the per-supplier tally is a third
    bucketed SUM over tiny rows. Output: (s_name, numwait)."""
    import pyarrow.parquet as pq

    from ..stages.group_collect import bucketed_reduce, bucketed_sum
    from ..stages.joins import hash_join_attach

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderstatus", "o_orderdate"]
    )

    def final_orders(batch: pa.Table) -> pa.Table:
        keep = np.asarray(
            pc.equal(batch["o_orderstatus"], "F").combine_chunks()
            if isinstance(batch["o_orderstatus"], pa.ChunkedArray)
            else pc.equal(batch["o_orderstatus"], "F")
        )
        d = np.asarray(batch["o_orderdate"], dtype="datetime64[D]").astype(np.int64)
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"].filter(pa.array(keep)),
                "o_days": pa.array(d[keep], type=pa.int64()),
            }
        )

    of = orders.map_batches(final_orders, batch_format="pyarrow")

    lineitem = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey", "l_shipdate"]
    )
    joined = hash_join_attach(lineitem, "l_orderkey", of, "o_orderkey", {"o_days": pa.int64()})

    def lateness(batch: pa.Table) -> pa.Table:
        od = batch["o_days"].combine_chunks()
        valid = ~np.asarray(od.is_null())
        ship = np.asarray(batch["l_shipdate"], dtype="datetime64[D]").astype(np.int64)[valid]
        odv = np.asarray(od.fill_null(0), dtype=np.int64)[valid]
        return pa.table(
            {
                "o": batch["l_orderkey"].filter(pa.array(valid)),
                "s": batch["l_suppkey"].filter(pa.array(valid)),
                "late": pa.array((ship > odv + late_days).astype(np.int64)),
            }
        )

    pairs = bucketed_reduce(
        joined.map_batches(lateness, batch_format="pyarrow"), ["o", "s"], {"late": "max"}
    )

    def widen(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch["s"], dtype=np.int64)
        late = np.asarray(batch["late"], dtype=np.int64)
        return pa.table(
            {
                "o": batch["o"],
                "n_supp": pa.array(np.ones(len(batch), dtype=np.int64)),
                "n_late": batch["late"],
                "late_s": pa.array(s * late, type=pa.int64()),
            }
        )

    per_order = bucketed_reduce(
        pairs.map_batches(widen, batch_format="pyarrow"),
        ["o"],
        {"n_supp": "sum", "n_late": "sum", "late_s": "sum"},
    )

    def waiting(batch: pa.Table) -> pa.Table:
        keep = (np.asarray(batch["n_supp"], dtype=np.int64) >= 2) & (
            np.asarray(batch["n_late"], dtype=np.int64) == 1
        )
        return pa.table(
            {
                "late_s": batch["late_s"].filter(pa.array(keep)),
                "numwait": pa.array(np.ones(int(keep.sum()), dtype=np.int64)),
            }
        )

    tally = bucketed_sum(
        per_order.map_batches(waiting, batch_format="pyarrow"), ["late_s"], ["numwait"]
    )

    supp = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"])
    sk = np.asarray(supp["s_suppkey"], dtype=np.int64)
    so = np.argsort(sk)
    names_ref = ray.put((sk[so], supp["s_name"].take(pa.array(so))))

    def attach(batch: pa.Table) -> pa.Table:
        sk_s, nm = bget(names_ref)
        ks = np.asarray(batch["late_s"], dtype=np.int64)
        pos = np.searchsorted(sk_s, ks)
        return pa.table({"s_name": nm.take(pa.array(pos)), "numwait": batch["numwait"]})

    return tally.map_batches(attach, batch_format="pyarrow")
