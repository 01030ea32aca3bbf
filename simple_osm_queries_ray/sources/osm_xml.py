"""OSM XML (``.osm``) element reader.

Reference entry point: ``OsmReader.Read`` streams an ``.osm.pbf`` through
per-type handlers (``/root/reference/src/osm/reader.go:40-112``). This module
is the Ray-native ingest for the XML flavour: ``read_binary_files`` over one
or many ``.osm`` files, one decode task per file (the parallel unit — OSM
extracts are commonly sharded per region). The per-element Python loop lives
only here, at the ingest boundary, exactly like the reference's streaming
decoder; everything downstream is vectorized Arrow.

The PBF flavour lives in ``sources/osm_pbf.py`` (hand-rolled wire decode,
blob-parallel) and emits the same element schema.

Element rows (one unified schema, ``etype`` discriminates):

    etype:int64 (0 node / 1 way / 2 relation), id:int64,
    lon/lat:float64 (nodes; null otherwise),
    tag_keys_str/tag_vals_str:list<string>,
    refs:list<int64>               (way node refs, document order),
    member_nodes/member_ways/member_rels:list<int64> (relation members,
                                    document order; roles are not queryable
                                    in the reference either, so dropped).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

ETYPE_NODE = 0
ETYPE_WAY = 1
ETYPE_RELATION = 2

_ELEM_SCHEMA = pa.schema(
    [
        ("etype", pa.int64()),
        ("id", pa.int64()),
        ("lon", pa.float64()),
        ("lat", pa.float64()),
        ("tag_keys_str", pa.list_(pa.string())),
        ("tag_vals_str", pa.list_(pa.string())),
        ("refs", pa.list_(pa.int64())),
        ("member_nodes", pa.list_(pa.int64())),
        ("member_ways", pa.list_(pa.int64())),
        ("member_rels", pa.list_(pa.int64())),
    ]
)

_MEMBER_SLOT = {"node": "member_nodes", "way": "member_ways", "relation": "member_rels"}


def _decompress(data: bytes) -> bytes:
    """Transparently unwrap the two compressed flavours OSM extracts ship in
    (``.osm.bz2`` and ``.osm.gz``), detected by magic bytes so globbed file
    lists can mix plain and compressed shards."""
    if data[:3] == b"BZh":
        import bz2

        return bz2.decompress(data)
    if data[:2] == b"\x1f\x8b":
        import gzip

        return gzip.decompress(data)
    return data


def _new_rows() -> dict[str, list]:
    return {name: [] for name in _ELEM_SCHEMA.names}


def _add_element(rows: dict[str, list], el) -> None:
    """Append one parsed node/way/relation XML element to the row columns."""

    def add(etype, eid, lon, lat, tags, refs, members):
        rows["etype"].append(etype)
        rows["id"].append(eid)
        rows["lon"].append(lon)
        rows["lat"].append(lat)
        rows["tag_keys_str"].append([k for k, _ in tags])
        rows["tag_vals_str"].append([v for _, v in tags])
        rows["refs"].append(refs)
        rows["member_nodes"].append(members.get("member_nodes", []))
        rows["member_ways"].append(members.get("member_ways", []))
        rows["member_rels"].append(members.get("member_rels", []))

    tags = [(t.attrib["k"], t.attrib["v"]) for t in el if t.tag == "tag"]
    if el.tag == "node":
        # osc delete stubs may omit lon/lat; keep them null
        lon = el.attrib.get("lon")
        lat = el.attrib.get("lat")
        add(
            ETYPE_NODE,
            int(el.attrib["id"]),
            None if lon is None else float(lon),
            None if lat is None else float(lat),
            tags,
            [],
            {},
        )
    elif el.tag == "way":
        refs = [int(nd.attrib["ref"]) for nd in el if nd.tag == "nd"]
        add(ETYPE_WAY, int(el.attrib["id"]), None, None, tags, refs, {})
    elif el.tag == "relation":
        members: dict[str, list[int]] = {}
        for m in el:
            if m.tag != "member":
                continue
            slot = _MEMBER_SLOT.get(m.attrib.get("type", ""))
            if slot is not None:
                members.setdefault(slot, []).append(int(m.attrib["ref"]))
        add(ETYPE_RELATION, int(el.attrib["id"]), None, None, tags, [], members)


def parse_osm_xml_bytes(data: bytes) -> pa.Table:
    """One ``.osm``/``.osm.bz2``/``.osm.gz`` document -> element table
    (schema above)."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(_decompress(data))
    rows = _new_rows()
    for el in root:
        _add_element(rows, el)
    return pa.Table.from_pydict(rows, schema=_ELEM_SCHEMA)


# osmChange actions (the ``op`` column of parse_osc_bytes)
OP_CREATE = 0
OP_MODIFY = 1
OP_DELETE = 2
_OSC_OPS = {"create": OP_CREATE, "modify": OP_MODIFY, "delete": OP_DELETE}


def parse_osc_bytes(data: bytes) -> pa.Table:
    """One osmChange (``.osc``, optionally bz2/gz) document -> element table
    with an extra ``op`` int64 column (0 create / 1 modify / 2 delete).
    Delete rows may be bare ``<node id=.../>`` stubs per the osc format;
    only ``etype``/``id`` matter for them."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(_decompress(data))
    rows = _new_rows()
    ops: list[int] = []
    for section in root:
        op = _OSC_OPS.get(section.tag)
        if op is None:
            continue
        for el in section:
            before = len(rows["id"])
            _add_element(rows, el)
            ops.extend([op] * (len(rows["id"]) - before))
    tbl = pa.Table.from_pydict(rows, schema=_ELEM_SCHEMA)
    return tbl.append_column("op", pa.array(ops, type=pa.int64()))


def read_osc(paths: str | list[str]) -> ray.data.Dataset:
    """``.osc`` change file(s) -> element+op Dataset (one task per file).

    Adds ``__seq``: (file order in the caller's path list) x 2^32 + row
    position in the file — osmChange deltas apply IN ORDER, and
    ``merge_changes`` needs the ordering to resolve an element touched by
    several operations (last write wins)."""
    import os

    plist = [paths] if isinstance(paths, str) else list(paths)
    order = {os.path.abspath(p): i for i, p in enumerate(plist)}
    # Ray may report paths in a different form than the caller passed
    # (URI-style, scheme-prefixed); fall back to basename matching when the
    # basenames are unique, and FAIL LOUDLY otherwise — a silent fseq=0
    # default would break last-write-wins ordering across deltas
    bases = [os.path.basename(p) for p in plist]
    order_base = (
        {b: i for i, b in enumerate(bases)} if len(set(bases)) == len(bases) else {}
    )

    def decode(batch: pa.Table) -> pa.Table:
        tables = []
        for blob, path in zip(batch["bytes"], batch["path"]):
            t = parse_osc_bytes(blob.as_py())
            key = str(path.as_py())
            fseq = order.get(os.path.abspath(key))
            if fseq is None:
                fseq = order_base.get(os.path.basename(key))
            if fseq is None:
                raise ValueError(
                    f"read_osc: reported file path {key!r} matches no input "
                    "path (by abspath or unique basename); cannot order "
                    "osmChange deltas deterministically"
                )
            seq = (np.int64(fseq) << np.int64(32)) + np.arange(len(t), dtype=np.int64)
            tables.append(t.append_column("__seq", pa.array(seq)))
        if not tables:
            return (
                _ELEM_SCHEMA.empty_table()
                .append_column("op", pa.array([], type=pa.int64()))
                .append_column("__seq", pa.array([], type=pa.int64()))
            )
        return pa.concat_tables(tables)

    return ray.data.read_binary_files(paths, include_paths=True).map_batches(
        decode, batch_format="pyarrow", batch_size=1
    )


def read_osm_xml(paths: str | list[str]) -> ray.data.Dataset:
    """``.osm`` file(s) -> element Dataset (one decode task per file)."""

    def decode(batch: pa.Table) -> pa.Table:
        tables = [parse_osm_xml_bytes(blob.as_py()) for blob in batch["bytes"]]
        return pa.concat_tables(tables) if tables else _ELEM_SCHEMA.empty_table()

    return ray.data.read_binary_files(paths).map_batches(
        decode, batch_format="pyarrow", batch_size=1
    )


def split_elements(
    elems: ray.data.Dataset,
) -> tuple[ray.data.Dataset, ray.data.Dataset, ray.data.Dataset]:
    """Element dataset -> (raw node, raw way, raw relation) projections."""

    def take(etype: int, cols: list[str]):
        def fn(batch: pa.Table) -> pa.Table:
            mask = pa.array(np.asarray(batch["etype"], dtype=np.int64) == etype)
            return batch.filter(mask).select(cols)

        return elems.map_batches(fn, batch_format="pyarrow")

    nodes = take(ETYPE_NODE, ["id", "lon", "lat", "tag_keys_str", "tag_vals_str"])
    ways = take(ETYPE_WAY, ["id", "refs", "tag_keys_str", "tag_vals_str"])
    rels = take(
        ETYPE_RELATION,
        ["id", "member_nodes", "member_ways", "member_rels", "tag_keys_str", "tag_vals_str"],
    )
    return nodes, ways, rels


def write_osm_xml_shards(nodes: ray.data.Dataset, out_dir: str) -> list[str]:
    """Serialize a node Dataset (``id, lon, lat`` + any extra columns, each
    extra column becoming a ``<tag k=.. v=..>``) to ``.osm`` XML shard
    files, one file per input block — the distributed inverse of
    :func:`read_osm_xml`, used for fixture generation and ingest round-trip
    verification. Each map task writes its own shard and emits the path
    (tiny), so the payload never collects on the driver. Coordinates are
    written with ``repr`` precision: Python float repr round-trips IEEE
    doubles bit-exactly through ``float()`` on the read side.

    Shard names are content-addressed (md5 of the id array), so reruns over
    the same input are idempotent; callers should clear ``out_dir`` when the
    input may have changed shape."""
    import hashlib
    import os
    from xml.sax.saxutils import quoteattr

    os.makedirs(out_dir, exist_ok=True)
    tag_cols = [c for c in nodes.schema().names if c not in ("id", "lon", "lat")]

    def write_shard(batch: pa.Table) -> pa.Table:
        ids_ = np.asarray(batch["id"], dtype=np.int64)
        if len(ids_) == 0:
            return pa.table({"path": pa.array([], type=pa.string())})
        lon = np.asarray(batch["lon"], dtype=np.float64)
        lat = np.asarray(batch["lat"], dtype=np.float64)
        tags = {c: batch[c].to_pylist() for c in tag_cols}
        name = hashlib.md5(ids_.tobytes()).hexdigest()[:16]
        path = os.path.join(out_dir, f"part-{name}.osm")
        # the per-row loop is the ingest/egress boundary, mirroring the
        # reference's streaming encoder — everything upstream is Arrow
        lines = ['<?xml version="1.0" encoding="UTF-8"?>', '<osm version="0.6">']
        for i in range(len(ids_)):
            body = "".join(
                f"<tag k={quoteattr(c)} v={quoteattr(str(tags[c][i]))}/>"
                for c in tag_cols
                if tags[c][i] is not None
            )
            head = f'<node id="{ids_[i]}" lon="{lon[i]!r}" lat="{lat[i]!r}">'
            lines.append(head + body + "</node>" if body else head[:-1] + "/>")
        lines.append("</osm>")
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write("\n".join(lines))
        os.replace(tmp, path)  # atomic: readers never see partial shards
        return pa.table({"path": pa.array([path])})

    paths = [
        r["path"]
        for r in nodes.map_batches(write_shard, batch_format="pyarrow").take_all()
    ]
    return sorted(paths)
