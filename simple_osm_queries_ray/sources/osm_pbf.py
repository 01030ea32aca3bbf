"""OSM PBF (``.osm.pbf``) reader — the reference's primary input format
(``/root/reference/src/osm/reader.go:40-112`` wraps osmpbf the same way).

The wire format (public OSM PBF spec): a sequence of
``[4-byte big-endian length][BlobHeader protobuf][Blob protobuf]`` frames;
each Blob holds a zlib-compressed ``PrimitiveBlock`` with a string table and
primitive groups (dense nodes with delta-coded ids/coords, ways with
delta-coded refs, relations with delta-coded member ids). Blocks are
independently decodable — the scale unit:

- the driver scans ONLY the frame headers (4 bytes + BlobHeader per blob) to
  build a (offset, size) blob list — O(#blobs) tiny reads;
- blob payloads decode in parallel Ray tasks (``from_items`` over the blob
  spans -> ``map_batches``), each emitting element rows in the same unified
  schema as the XML reader (``sources/osm_xml.py``).

No protobuf runtime ships in this container, so the minimal wire decode
(varints, length-delimited fields, packed scalars) is implemented here
directly; packed numeric fields batch-decode through numpy. A matching
minimal encoder (``write_osm_pbf``) exists for round-trip tests and fixture
generation — real extracts use the same spec.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa
import ray.data

from .osm_xml import _ELEM_SCHEMA

# -- protobuf wire primitives ------------------------------------------------


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _iter_fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a protobuf message.

    wire 0 -> int varint; wire 2 -> bytes; wire 5 -> 4 raw bytes;
    wire 1 -> 8 raw bytes.
    """
    pos, n = 0, len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:
            val, pos = _read_varint(buf, pos)
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wire == 5:
            val = buf[pos : pos + 4]
            pos += 4
        elif wire == 1:
            val = buf[pos : pos + 8]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


def _packed_varints(buf: bytes) -> np.ndarray:
    """Decode a packed varint field to int64 (numpy-assisted: one pass over
    the byte array instead of per-value Python reads)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if len(b) == 0:
        return np.array([], dtype=np.int64)
    ends = np.nonzero(b < 0x80)[0]
    out = np.zeros(len(ends), dtype=np.uint64)
    starts = np.concatenate([[0], ends[:-1] + 1])
    # varints here are <= 10 bytes; accumulate per byte position
    max_len = int((ends - starts).max()) + 1
    for k in range(max_len):
        idx = starts + k
        live = idx <= ends
        out[live] |= (b[idx[live]].astype(np.uint64) & np.uint64(0x7F)) << np.uint64(7 * k)
    return out.astype(np.int64)


def _zigzag_decode(v: np.ndarray) -> np.ndarray:
    u = v.astype(np.uint64)
    return ((u >> np.uint64(1)).astype(np.int64)) ^ -(v & 1)


def _decode_packed_group(bufs: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """Decode MANY packed-varint payloads in ONE numpy pass.

    Returns (values, per_buf_counts). The payloads concatenate safely — a
    varint never spans a packed field boundary — so the whole group costs
    one ``_packed_varints`` scan plus a searchsorted to re-segment, instead
    of one Python-level decode per element (r02 verdict #7: the per-way
    loop would cost hours on a Germany-scale extract)."""
    if not bufs:
        return np.array([], dtype=np.int64), np.zeros(0, dtype=np.int64)
    lens = np.fromiter((len(x) for x in bufs), dtype=np.int64, count=len(bufs))
    joined = b"".join(bufs)
    vals = _packed_varints(joined)
    if len(joined) == 0:
        return vals, np.zeros(len(bufs), dtype=np.int64)
    b = np.frombuffer(joined, dtype=np.uint8)
    ends = np.nonzero(b < 0x80)[0]  # last byte of each varint
    bounds = np.cumsum(lens)
    cum_counts = np.searchsorted(ends, bounds - 1, side="right")
    counts = np.diff(np.concatenate([[0], cum_counts]))
    return vals, counts


def _segmented_cumsum(deltas: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Per-segment cumulative sum (delta-coded refs/member ids restart at
    every element)."""
    if len(deltas) == 0:
        return deltas
    cs = np.cumsum(deltas)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    live = counts > 0
    prev = np.zeros(len(counts), dtype=np.int64)
    prev[live] = np.where(starts[live] > 0, cs[np.maximum(starts[live] - 1, 0)], 0)
    seg_idx = np.repeat(np.arange(len(counts)), counts)
    return cs - prev[seg_idx]


def _varint(v: int) -> bytes:
    out = bytearray()
    v &= (1 << 64) - 1
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _field(num: int, wire: int, payload: bytes | int) -> bytes:
    key = _varint((num << 3) | wire)
    if wire == 0:
        return key + _varint(payload)
    return key + _varint(len(payload)) + payload


def _packed(num: int, values) -> bytes:
    body = b"".join(_varint(int(v)) for v in values)
    return _field(num, 2, body)


# -- decode ------------------------------------------------------------------


def scan_blob_spans(path: str) -> list[tuple[int, int, str]]:
    """(payload_offset, payload_size, type) per blob — header-only reads."""
    spans = []
    with open(path, "rb") as f:
        while True:
            head = f.read(4)
            if len(head) < 4:
                break
            (hlen,) = struct.unpack(">I", head)
            header = f.read(hlen)
            btype, dsize = "", 0
            for field, _w, val in _iter_fields(header):
                if field == 1:
                    btype = val.decode()
                elif field == 3:
                    dsize = val
            off = f.tell()
            spans.append((off, dsize, btype))
            f.seek(off + dsize)
    return spans


def _blob_payload(blob: bytes) -> bytes:
    raw, zdata = None, None
    for field, _w, val in _iter_fields(blob):
        if field == 1:
            raw = val
        elif field == 3:
            zdata = val
    if raw is not None:
        return raw
    if zdata is not None:
        return zlib.decompress(zdata)
    raise ValueError("blob has neither raw nor zlib_data")


def decode_primitive_block(data: bytes) -> pa.Table:
    """One PrimitiveBlock -> element table (unified XML/PBF schema)."""
    stringtable: list[str] = []
    groups: list[bytes] = []
    granularity, lat_off, lon_off = 100, 0, 0
    for field, _w, val in _iter_fields(data):
        if field == 1:
            stringtable = [
                v.decode("utf-8") for f2, _w2, v in _iter_fields(val) if f2 == 1
            ]
        elif field == 2:
            groups.append(val)
        elif field == 17:
            granularity = val
        elif field == 19:
            lat_off = val
        elif field == 20:
            lon_off = val

    rows: dict[str, list] = {name: [] for name in _ELEM_SCHEMA.names}

    def add(etype, eid, lon, lat, kv, refs, mnodes, mways, mrels):
        rows["etype"].append(etype)
        rows["id"].append(eid)
        rows["lon"].append(lon)
        rows["lat"].append(lat)
        rows["tag_keys_str"].append([stringtable[k] for k, _ in kv])
        rows["tag_vals_str"].append([stringtable[v] for _, v in kv])
        rows["refs"].append(refs)
        rows["member_nodes"].append(mnodes)
        rows["member_ways"].append(mways)
        rows["member_rels"].append(mrels)

    def coord(vals: np.ndarray, off: int) -> np.ndarray:
        return 1e-9 * (off + granularity * vals.astype(np.float64))

    dense_tables: list[pa.Table] = []
    st_arr = pa.array(stringtable, type=pa.string())

    def dense_table(ids, lon_d, lat_d, kv_flat) -> pa.Table:
        """DenseNodes -> element table, fully vectorized (nodes dominate PBF
        volume; ways/relations below stay per-element)."""
        n = len(ids)
        if kv_flat is None or len(kv_flat) == 0:
            key_ids = val_ids = np.array([], dtype=np.int64)
            pairs_per_node = np.zeros(n, dtype=np.int64)
        else:
            # 0-terminated (k, v) runs, one run per node; string index 0 is
            # reserved, so zeros are unambiguous terminators
            zeros = np.nonzero(kv_flat == 0)[0]
            run_start = np.concatenate([[0], zeros[:-1] + 1])
            kv_len = zeros - run_start
            total = int(kv_len.sum())
            base = np.repeat(run_start, kv_len)
            within = np.arange(total, dtype=np.int64) - np.repeat(
                np.cumsum(kv_len) - kv_len, kv_len
            )
            entries = kv_flat[base + within]
            key_ids = entries[within % 2 == 0]
            val_ids = entries[within % 2 == 1]
            pairs_per_node = kv_len // 2
            if len(pairs_per_node) < n:
                pairs_per_node = np.concatenate(
                    [pairs_per_node, np.zeros(n - len(pairs_per_node), dtype=np.int64)]
                )
        off = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(pairs_per_node, out=off[1:])
        tag_keys = pa.ListArray.from_arrays(
            pa.array(off), st_arr.take(pa.array(key_ids, type=pa.int64()))
        )
        tag_vals = pa.ListArray.from_arrays(
            pa.array(off), st_arr.take(pa.array(val_ids, type=pa.int64()))
        )
        empty_off = pa.array(np.zeros(n + 1, dtype=np.int32))

        def empty_lists(t):
            return pa.ListArray.from_arrays(empty_off, pa.array([], type=t))

        return pa.table(
            {
                "etype": pa.array(np.zeros(n, dtype=np.int64)),
                "id": pa.array(ids, type=pa.int64()),
                "lon": pa.array(lon_d, type=pa.float64()),
                "lat": pa.array(lat_d, type=pa.float64()),
                "tag_keys_str": tag_keys,
                "tag_vals_str": tag_vals,
                "refs": empty_lists(pa.int64()),
                "member_nodes": empty_lists(pa.int64()),
                "member_ways": empty_lists(pa.int64()),
                "member_rels": empty_lists(pa.int64()),
            },
            schema=_ELEM_SCHEMA,
        )

    # ways/relations batch across the whole block: the framing loop slices
    # out each message's packed payloads (O(1) Python per element), and the
    # varint streams decode in one numpy pass per field (_decode_packed_group)
    way_ids: list[int] = []
    way_keys: list[bytes] = []
    way_vals: list[bytes] = []
    way_refs: list[bytes] = []
    rel_ids: list[int] = []
    rel_keys: list[bytes] = []
    rel_vals: list[bytes] = []
    rel_mids: list[bytes] = []
    rel_types: list[bytes] = []

    def list_offsets(counts: np.ndarray) -> pa.Array:
        off = np.zeros(len(counts) + 1, dtype=np.int32)
        np.cumsum(counts, out=off[1:])
        return pa.array(off)

    def tag_list_arrays(key_bufs, val_bufs, n):
        kf, kc = _decode_packed_group(key_bufs)
        vf, _ = _decode_packed_group(val_bufs)
        off = list_offsets(kc if len(kc) == n else np.zeros(n, dtype=np.int64))
        return (
            pa.ListArray.from_arrays(off, st_arr.take(pa.array(kf, type=pa.int64()))),
            pa.ListArray.from_arrays(off, st_arr.take(pa.array(vf, type=pa.int64()))),
        )

    def ways_table() -> pa.Table:
        n = len(way_ids)
        tag_keys, tag_vals = tag_list_arrays(way_keys, way_vals, n)
        rd, rc = _decode_packed_group(way_refs)
        refs_flat = _segmented_cumsum(_zigzag_decode(rd), rc)
        nulls = pa.nulls(n, pa.float64())
        empty_off = pa.array(np.zeros(n + 1, dtype=np.int32))

        def empty_lists():
            return pa.ListArray.from_arrays(empty_off, pa.array([], type=pa.int64()))

        return pa.table(
            {
                "etype": pa.array(np.ones(n, dtype=np.int64)),
                "id": pa.array(np.asarray(way_ids, dtype=np.int64)),
                "lon": nulls,
                "lat": nulls,
                "tag_keys_str": tag_keys,
                "tag_vals_str": tag_vals,
                "refs": pa.ListArray.from_arrays(
                    list_offsets(rc), pa.array(refs_flat, type=pa.int64())
                ),
                "member_nodes": empty_lists(),
                "member_ways": empty_lists(),
                "member_rels": empty_lists(),
            },
            schema=_ELEM_SCHEMA,
        )

    def rels_table() -> pa.Table:
        n = len(rel_ids)
        tag_keys, tag_vals = tag_list_arrays(rel_keys, rel_vals, n)
        md, mc = _decode_packed_group(rel_mids)
        mem_flat = _segmented_cumsum(_zigzag_decode(md), mc)
        tp, tc = _decode_packed_group(rel_types)
        if len(tp) != len(mem_flat) or not np.array_equal(tc, mc):
            # a memids payload without a matching-length types payload is
            # malformed input; fail with the offending relation ids rather
            # than letting a shape-mismatched boolean mask kill the block
            bad = np.asarray(rel_ids, dtype=np.int64)[tc != mc] if len(tc) == len(mc) else np.asarray(rel_ids, dtype=np.int64)
            raise ValueError(
                f"PBF relation member types/memids length mismatch "
                f"({len(tp)} types vs {len(mem_flat)} memids; relation ids {bad[:5].tolist()}...)"
            )
        seg_idx = np.repeat(np.arange(n, dtype=np.int64), mc)
        nulls = pa.nulls(n, pa.float64())
        empty_off = pa.array(np.zeros(n + 1, dtype=np.int32))

        def typed_members(t: int) -> pa.ListArray:
            mask = tp == t
            counts = np.bincount(seg_idx[mask], minlength=n).astype(np.int64)
            return pa.ListArray.from_arrays(
                list_offsets(counts), pa.array(mem_flat[mask], type=pa.int64())
            )

        return pa.table(
            {
                "etype": pa.array(np.full(n, 2, dtype=np.int64)),
                "id": pa.array(np.asarray(rel_ids, dtype=np.int64)),
                "lon": nulls,
                "lat": nulls,
                "tag_keys_str": tag_keys,
                "tag_vals_str": tag_vals,
                "refs": pa.ListArray.from_arrays(
                    empty_off, pa.array([], type=pa.int64())
                ),
                "member_nodes": typed_members(0),
                "member_ways": typed_members(1),
                "member_rels": typed_members(2),
            },
            schema=_ELEM_SCHEMA,
        )

    for g in groups:
        for field, _w, val in _iter_fields(g):
            if field == 2:  # DenseNodes
                ids = lats = lons = kv_flat = None
                for f2, _w2, v in _iter_fields(val):
                    if f2 == 1:
                        ids = np.cumsum(_zigzag_decode(_packed_varints(v)))
                    elif f2 == 8:
                        lats = np.cumsum(_zigzag_decode(_packed_varints(v)))
                    elif f2 == 9:
                        lons = np.cumsum(_zigzag_decode(_packed_varints(v)))
                    elif f2 == 10:
                        kv_flat = _packed_varints(v)
                dense_tables.append(
                    dense_table(ids, coord(lons, lon_off), coord(lats, lat_off), kv_flat)
                )
            elif field == 1:  # plain Node
                nid, keys, vals_, nlat, nlon = 0, [], [], 0, 0
                for f2, _w2, v in _iter_fields(val):
                    if f2 == 1:
                        nid = v
                    elif f2 == 2:
                        keys = _packed_varints(v).tolist()
                    elif f2 == 3:
                        vals_ = _packed_varints(v).tolist()
                    elif f2 == 8:
                        nlat = _zigzag_decode(np.array([v]))[0]
                    elif f2 == 9:
                        nlon = _zigzag_decode(np.array([v]))[0]
                add(0, int(nid), float(coord(np.array([nlon]), lon_off)[0]),
                    float(coord(np.array([nlat]), lat_off)[0]),
                    list(zip(keys, vals_)), [], [], [], [])
            elif field == 3:  # Way: slice payload spans only, decode batched
                wid, kb, vb, rb = 0, b"", b"", b""
                for f2, _w2, v in _iter_fields(val):
                    if f2 == 1:
                        wid = v
                    elif f2 == 2:
                        kb = v
                    elif f2 == 3:
                        vb = v
                    elif f2 == 8:
                        rb = v
                way_ids.append(int(wid))
                way_keys.append(kb)
                way_vals.append(vb)
                way_refs.append(rb)
            elif field == 4:  # Relation: same span-slicing
                rid, kb, vb, mb, tb = 0, b"", b"", b"", b""
                for f2, _w2, v in _iter_fields(val):
                    if f2 == 1:
                        rid = v
                    elif f2 == 2:
                        kb = v
                    elif f2 == 3:
                        vb = v
                    elif f2 == 9:
                        mb = v
                    elif f2 == 10:
                        tb = v
                rel_ids.append(int(rid))
                rel_keys.append(kb)
                rel_vals.append(vb)
                rel_mids.append(mb)
                rel_types.append(tb)

    tables = [t for t in dense_tables if len(t)]
    if way_ids:
        tables.append(ways_table())
    if rel_ids:
        tables.append(rels_table())
    if rows["id"]:
        tables.append(pa.Table.from_pydict(rows, schema=_ELEM_SCHEMA))
    return pa.concat_tables(tables) if tables else _ELEM_SCHEMA.empty_table()


def read_osm_pbf(path: str | list[str]) -> ray.data.Dataset:
    """``.osm.pbf`` file(s) -> element Dataset; one decode task per data
    blob (blobs from every file share one task pool — a sharded fixture
    parallelizes identically to one big file)."""
    paths = [path] if isinstance(path, str) else list(path)
    spans = [
        {"path": p, "offset": off, "size": size}
        for p in paths
        for off, size, btype in scan_blob_spans(p)
        if btype == "OSMData"
    ]

    def decode(batch: pa.Table) -> pa.Table:
        tables = []
        for p, off, size in zip(
            batch["path"].to_pylist(),
            np.asarray(batch["offset"], dtype=np.int64),
            np.asarray(batch["size"], dtype=np.int64),
        ):
            with open(p, "rb") as f:
                f.seek(int(off))
                blob = f.read(int(size))
            tables.append(decode_primitive_block(_blob_payload(blob)))
        return pa.concat_tables(tables) if tables else _ELEM_SCHEMA.empty_table()

    if not spans:
        return ray.data.from_arrow(_ELEM_SCHEMA.empty_table())
    # several blobs per decode task: real-world PBFs carry ~8000 nodes per
    # blob, and one OUTPUT BLOCK per blob (batch_size=1) fragments a 50 M-
    # node file into ~6000 tiny blocks — the sort-shuffle task count
    # downstream is quadratic in block count and the driver's scheduling
    # loop saturates long before the workers do (observed: 30 min at 100%
    # driver CPU at 50 M nodes). 8 blobs/task ~ 64k rows/block keeps decode
    # parallelism in the hundreds while bounding downstream task counts.
    return ray.data.from_items(spans).map_batches(
        decode, batch_format="pyarrow", batch_size=8
    )


# -- encode (fixtures / round-trip tests) ------------------------------------


def write_osm_pbf(path: str, elements: pa.Table, *, nodes_per_block: int = 8000) -> None:
    """Minimal spec-conformant writer: dense nodes, ways, relations, one
    OSMHeader blob + zlib OSMData blobs. Fixture/round-trip use."""
    etype = np.asarray(elements["etype"], dtype=np.int64)

    def str_table(tbl_rows) -> tuple[list[bytes], dict[str, int]]:
        table = [b""]  # index 0 reserved (dense keys_vals terminator)
        index: dict[str, int] = {"": 0}
        for keys, vals in tbl_rows:
            for s in list(keys) + list(vals):
                if s not in index:
                    index[s] = len(table)
                    table.append(s.encode("utf-8"))
        return table, index

    def st_msg(table: list[bytes]) -> bytes:
        return _field(1, 2, b"".join(_field(1, 2, s) for s in table))

    def blob_frame(btype: str, payload: bytes) -> bytes:
        z = zlib.compress(payload)
        blob = _field(2, 0, len(payload)) + _field(3, 2, z)
        header = _field(1, 2, btype.encode()) + _field(3, 0, len(blob))
        return struct.pack(">I", len(header)) + header + blob

    out = [blob_frame("OSMHeader", _field(4, 2, b"DenseNodes"))]

    node_rows = elements.filter(pa.array(etype == 0))
    way_rows = elements.filter(pa.array(etype == 1))
    rel_rows = elements.filter(pa.array(etype == 2))

    def tag_lists(tbl):
        return list(
            zip(
                tbl["tag_keys_str"].to_pylist(),
                tbl["tag_vals_str"].to_pylist(),
            )
        )

    # nodes chunk into nodes_per_block-sized DenseNodes blobs (each
    # PrimitiveBlock carries its OWN string table and restarts the delta
    # coding, per spec) so read_osm_pbf's one-task-per-blob parallelism is
    # real for round-trip fixtures; ways + relations follow in one blob
    def node_blob(chunk: pa.Table) -> bytes:
        tl = tag_lists(chunk)
        table, index = str_table(tl)
        ids = np.asarray(chunk["id"], dtype=np.int64)
        lon = np.round(np.asarray(chunk["lon"], dtype=np.float64) * 1e9 / 100).astype(np.int64)
        lat = np.round(np.asarray(chunk["lat"], dtype=np.float64) * 1e9 / 100).astype(np.int64)
        kv = []
        for keys, vals in tl:
            for k, v in zip(keys, vals):
                kv += [index[k], index[v]]
            kv.append(0)
        dense = (
            _packed(1, [_zigzag(int(d)) for d in np.diff(ids, prepend=0)])
            + _packed(8, [_zigzag(int(d)) for d in np.diff(lat, prepend=0)])
            + _packed(9, [_zigzag(int(d)) for d in np.diff(lon, prepend=0)])
            + _packed(10, kv)
        )
        return st_msg(table) + _field(2, 2, _field(2, 2, dense))

    for start in range(0, len(node_rows), nodes_per_block):
        out.append(
            blob_frame("OSMData", node_blob(node_rows.slice(start, nodes_per_block)))
        )

    table, index = str_table(tag_lists(way_rows) + tag_lists(rel_rows))
    body = [st_msg(table)]

    for i in range(len(way_rows)):
        keys = way_rows["tag_keys_str"][i].as_py()
        vals = way_rows["tag_vals_str"][i].as_py()
        refs = np.asarray(way_rows["refs"][i].as_py(), dtype=np.int64)
        msg = (
            _field(1, 0, int(way_rows["id"][i].as_py()))
            + _packed(2, [index[k] for k in keys])
            + _packed(3, [index[v] for v in vals])
            + _packed(8, [_zigzag(int(d)) for d in np.diff(refs, prepend=0)])
        )
        body.append(_field(2, 2, _field(3, 2, msg)))

    for i in range(len(rel_rows)):
        keys = rel_rows["tag_keys_str"][i].as_py()
        vals = rel_rows["tag_vals_str"][i].as_py()
        members = (
            [(m, 0) for m in rel_rows["member_nodes"][i].as_py()]
            + [(m, 1) for m in rel_rows["member_ways"][i].as_py()]
            + [(m, 2) for m in rel_rows["member_rels"][i].as_py()]
        )
        memids = np.asarray([m for m, _ in members], dtype=np.int64)
        msg = (
            _field(1, 0, int(rel_rows["id"][i].as_py()))
            + _packed(2, [index[k] for k in keys])
            + _packed(3, [index[v] for v in vals])
            + _packed(8, [index[""] for _ in members])  # roles: empty string
            + _packed(9, [_zigzag(int(d)) for d in np.diff(memids, prepend=0)])
            + _packed(10, [t for _, t in members])
        )
        body.append(_field(2, 2, _field(4, 2, msg)))

    if len(way_rows) or len(rel_rows):
        out.append(blob_frame("OSMData", b"".join(body)))
    with open(path, "wb") as f:
        f.write(b"".join(out))
