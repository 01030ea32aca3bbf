"""TagIndex semantics: next-lower-value lookup and dictionaries.

Vectors from /root/reference/src/index/tag_test.go:8-86.
"""

from simple_osm_queries_ray.functions.tags import TagIndex
from simple_osm_queries_ray.model import NOT_FOUND


def _ti(values):
    return TagIndex(keys=["k"], values=[values])


def test_next_lower_value_index_plain():
    ti = _ti(["v1", "v2", "v4"])
    assert ti.next_lower_value_index(0, "v1") == (0, True)
    assert ti.next_lower_value_index(0, "v2") == (1, True)
    assert ti.next_lower_value_index(0, "v4") == (2, True)
    assert ti.next_lower_value_index(0, "v3") == (1, False)
    assert ti.next_lower_value_index(0, "v0") == (NOT_FOUND, False)
    assert ti.next_lower_value_index(0, "v5") == (2, False)
    assert ti.next_lower_value_index(0, "v2.5") == (1, False)


def test_next_lower_value_index_mixed_numbers_and_strings():
    ti = _ti(["1", "1m", "1.5 m", "2.5"])
    assert ti.next_lower_value_index(0, "1") == (0, True)
    assert ti.next_lower_value_index(0, "1m") == (1, True)
    assert ti.next_lower_value_index(0, "1.5 m") == (2, True)
    assert ti.next_lower_value_index(0, "1.5") == (1, False)
    assert ti.next_lower_value_index(0, "0") == (NOT_FOUND, False)
    assert ti.next_lower_value_index(0, "2") == (2, False)
    assert ti.next_lower_value_index(0, "2m") == (2, False)
    assert ti.next_lower_value_index(0, "2.5m") == (3, False)


def test_build_sorts_values_naturally():
    ti = TagIndex.from_tag_lists({"width": ["2", "10", "1.5 m", "1"]})
    assert ti.values[0] == ["1", "1.5 m", "2", "10"]


def test_save_load_roundtrip(tmp_path):
    ti = TagIndex(keys=["a", "weird=key"], values=[["x", "y|z"], ["new\nline"]])
    p = str(tmp_path / "tag-index")
    ti.save(p)
    back = TagIndex.load(p)
    assert back.keys == ti.keys
    assert back.values == ti.values


def test_lookups():
    ti = TagIndex(keys=["amenity"], values=[["bench", "tree"]])
    assert ti.key_index("amenity") == 0
    assert ti.key_index("nope") == NOT_FOUND
    assert ti.value_index("amenity", "tree") == 1
    assert ti.value_index("amenity", "nope") == NOT_FOUND
    assert ti.value_index("nope", "tree") == NOT_FOUND


def test_check_validity(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data

    from simple_osm_queries_ray.functions.tags import TagIndex
    from simple_osm_queries_ray.stages.tag_encode import check_validity

    ti = TagIndex.from_tag_lists({"k": ["a", "b"]})
    good = pa.table(
        {
            "tag_keys": pa.array([[0], [0]], type=pa.list_(pa.int32())),
            "tag_vals": pa.array([[0], [1]], type=pa.list_(pa.int32())),
        }
    )
    bad = pa.table(
        {
            "tag_keys": pa.array([[0], [5], [0]], type=pa.list_(pa.int32())),
            "tag_vals": pa.array([[0], [0], [9]], type=pa.list_(pa.int32())),
        }
    )
    ref = ray.put(ti)
    assert check_validity(ray.data.from_arrow(good), ref) == 0
    assert check_validity(ray.data.from_arrow(bad), ref) == 2


def test_extended_with_keeps_existing_key_indices_stable():
    # stable dictionary evolution for incremental refresh: existing keys
    # never move, new keys append (key order carries no semantics)
    base = TagIndex(keys=["lang", "rtype", "wtype"],
                    values=[["de", "en"], ["route"], ["primary", "track"]])
    evolved = base.extended_with({"touched": ["yes"], "lang": ["en"]})
    assert evolved.keys == ["lang", "rtype", "wtype", "touched"]
    for k in ("lang", "rtype", "wtype"):
        assert evolved.key_index(k) == base.key_index(k)
    assert evolved.key_index("touched") == 3
    # unchanged value dictionaries are identical objects-by-content
    assert evolved.values[:3] == base.values[:3]


def test_extended_with_identity_when_no_novelty():
    base = TagIndex(keys=["a", "b"], values=[["1", "2"], ["x"]])
    same = base.extended_with({"a": ["2", "1"], "b": ["x"]})
    assert same.keys == base.keys
    assert same.values == base.values


def test_extended_with_new_value_resorts_only_its_key():
    base = TagIndex(keys=["a", "b"], values=[["v1", "v3"], ["x", "y"]])
    ev = base.extended_with({"a": ["v2"]})
    # value order stays natural-sorted (the comparison rewrite depends on
    # it), so v3's index shifts — bounded to key 'a'
    assert ev.values[0] == ["v1", "v2", "v3"]
    assert ev.values[1] == ["x", "y"]
    assert ev.value_index("b", "y") == base.value_index("b", "y")
