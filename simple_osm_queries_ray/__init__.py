"""simple_osm_queries_ray — a Ray-Data-native spatial query / data-processing engine.

From-scratch reimplementation of the query and data-processing capabilities of
``hauke96/simple-osm-queries`` (reference at /root/reference, Go) as idiomatic
Ray Data pipelines: ``ray.data.Dataset`` -> ``map_batches`` over zero-copy
Arrow batches, actor pools for stateful stages, ``groupby``-on-cell-key
shuffles with explicit skew handling.

Layout
------
- ``functions/``  pure vectorized kernels (cells, tags, natural sort, geometry)
- ``parser/``     the soq query language: lexer, AST, parser (driver-side)
- ``stages/``     Ray Data batch-transform stages (filters, joins, dedup, ...)
- ``sources/``    dataset readers / synthetic feature derivation / sinks
- ``pipelines/``  end-to-end pipelines (index build, query compile+execute)
- ``state/``      broadcast helpers, checkpoint manifests

The engine must never call ``ray.init()`` itself — sessions are owned by the
caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"
