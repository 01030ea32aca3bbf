"""Multimodal image table + decode stages: schema, PSNR invariant, phash."""

import numpy as np
import pytest

from simple_osm_queries_ray.sources.images import (
    decode_image,
    encode_image,
    image_table,
    psnr,
    reference_pixels,
)
from simple_osm_queries_ray.stages.image import decode_features, resize_images

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def imgs():
    return image_table(SF).materialize()


def test_schema(imgs):
    names = set(imgs.schema().names)
    assert names == {"image_id", "bytes", "w", "h", "fmt", "caption", "phash"}
    s = dict(zip(imgs.schema().names, imgs.schema().types))
    import pyarrow as pa

    assert s["bytes"] == pa.binary()
    assert s["w"] == pa.int32() and s["h"] == pa.int32()
    assert s["phash"] == pa.int64()


def test_roundtrip_psnr(imgs):
    rows = imgs.take(60)
    for r in rows:
        doc_id = int(r["image_id"][3:])
        ref = reference_pixels(doc_id, r["w"], r["h"])
        dec = decode_image(r["bytes"])
        assert dec.shape == ref.shape
        if r["fmt"] == "png":
            assert np.array_equal(dec, ref)  # lossless
        else:
            p = psnr(dec, ref)
            assert p >= 40.0, p  # north-rule invariant for lossy formats


def test_caption_equality(imgs):
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas().set_index("doc_id")
    for r in imgs.take(20):
        doc_id = int(r["image_id"][3:])
        assert r["caption"] == docs.loc[doc_id, "text"]


def test_decode_features_phash_consistency(imgs):
    out = decode_features(imgs, concurrency=2).to_pandas()
    assert (out["phash_decoded"] == out["phash"]).all()
    assert ((out[["mean_r", "mean_g", "mean_b"]] >= 0).all()
            & (out[["mean_r", "mean_g", "mean_b"]] <= 255).all()).all()


def test_resize(imgs):
    out = resize_images(imgs.limit(10), w=16, h=16, concurrency=2).to_pandas()
    assert (out["w"] == 16).all() and (out["h"] == 16).all()
    px = decode_image(out["bytes"].iloc[0])
    assert px.shape == (16, 16, 3)


def test_unknown_codec_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"JFIF!" + b"\x00" * 16)


def test_phash_near_dup_self_consistency(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from simple_osm_queries_ray.stages.image import phash_near_dup

    # identical phashes -> pair; distance > max_hamming -> no pair
    t = pa.table(
        {
            "image_id": pa.array(["img00000001", "img00000002", "img00000003"]),
            "phash": pa.array([0x0F0F, 0x0F0F, -1], type=pa.int64()),
        }
    )
    pairs = phash_near_dup(ray.data.from_arrow(t), max_hamming=2).to_pandas()
    assert len(pairs) == 1
    assert (int(pairs.id_a[0]), int(pairs.id_b[0])) == (1, 2)


def test_audio_features(ray_session):
    import numpy as np

    from simple_osm_queries_ray.stages.audio import (
        SAMPLE_RATE,
        audio_features,
        synthetic_audio_table,
    )

    ds = synthetic_audio_table("/root/testdata/sf0.001")
    out = audio_features(ds).to_pandas()
    assert len(out) == 500
    assert (out.rms > 0).all() and (out.peak <= 1.0).all()
    # doc 0: n = 1000 samples -> 0.0625 s
    row0 = out[out.clip_id == "clip00000000"].iloc[0]
    assert abs(row0.seconds - 1000 / SAMPLE_RATE) < 1e-12
    # rms of 0.6sin+0.3sin mix ~= sqrt(0.18+0.045) ~= 0.474 (finite-n tolerance)
    assert 0.4 < row0.rms < 0.55


def test_video_frame_sampler(ray_session):
    """SOQV fan-out: every_n sampling emits the right frames with the right
    pixels (frame payloads decode back to the deterministic per-frame RNG)."""
    import numpy as np

    from simple_osm_queries_ray.sources.images import decode_image, reference_pixels
    from simple_osm_queries_ray.stages.image import (
        sample_video_frames,
        synthetic_video_table,
    )

    vids = synthetic_video_table("/root/testdata/sf0.001")
    frames = sample_video_frames(vids, every_n=5).to_pandas()
    per_vid = frames.groupby("video_id").frame_idx.apply(list)
    assert all(v == [0, 5, 10] for v in per_vid)
    row = frames.iloc[0]
    doc_id = int(row.video_id[3:])
    px = decode_image(row["bytes"])
    w, h = 8 + doc_id % 3 * 4, 8 + doc_id % 5 * 2
    np.testing.assert_array_equal(
        px, reference_pixels(doc_id * 1000 + int(row.frame_idx), w, h)
    )


def test_tile_mosaic_matches_direct_computation():
    """Per-tile mean RGB from the distributed mosaic equals a direct numpy
    computation over the same decoded pixels."""
    import numpy as np

    from simple_osm_queries_ray.sources.images import decode_image, image_table
    from simple_osm_queries_ray.sources.synthetic import geolocate
    from simple_osm_queries_ray.stages.geo import tile_id
    from simple_osm_queries_ray.stages.image import tile_mosaic

    SF = "/root/testdata/sf0.001"
    got = tile_mosaic(image_table(SF), zoom=6).to_pandas().sort_values("tile").reset_index(drop=True)

    rows = image_table(SF).select_columns(["image_id", "bytes"]).to_pandas()
    ids = np.array([int(s[3:]) for s in rows["image_id"]], dtype=np.int64)
    lon, lat = geolocate(ids)
    tiles = tile_id(lon, lat, 6)
    acc: dict[int, list] = {}
    for t, blob in zip(tiles, rows["bytes"]):
        px = decode_image(blob)
        e = acc.setdefault(int(t), [np.zeros(3, dtype=np.int64), 0])
        e[0] += px.reshape(-1, 3).sum(axis=0, dtype=np.int64)
        e[1] += px.shape[0] * px.shape[1]
    assert len(got) == len(acc)
    for row in got.itertuples():
        s, n = acc[int(row.tile)]
        assert row.n_pixels == n
        assert row.mean_r_milli == s[0] * 1000 // n
        assert row.mean_g_milli == s[1] * 1000 // n
        assert row.mean_b_milli == s[2] * 1000 // n


def test_phash_dedup_groups_pairs_dup_with_original(ray_session):
    """Every lossy re-encode (id + DUP_IMAGE_OFFSET) must land in the same
    group as its original, and the group label is the min reachable id (so
    the original's group <= its own id); images with no near-dup partner are
    singletons labeled by their own id."""
    from simple_osm_queries_ray.sources.images import DUP_IMAGE_OFFSET, dup_image_table
    from simple_osm_queries_ray.stages.image import phash_dedup_groups

    df = phash_dedup_groups(dup_image_table(SF), max_hamming=6).to_pandas()
    g = dict(zip(df["image_id"], df["group_id"]))
    nums = {int(s[3:]) for s in df["image_id"]}
    dups = [i for i in nums if i >= DUP_IMAGE_OFFSET]
    assert dups, "fixture must contain duplicate images"
    for d in dups:
        orig = d - DUP_IMAGE_OFFSET
        assert g[f"img{d:08d}"] == g[f"img{orig:08d}"]
        assert g[f"img{orig:08d}"] <= orig
    # every image labeled exactly once
    assert len(df) == len(nums)


# -- metadata-only tables + quality gate + keep-largest dedup ----------------


def test_image_meta_table_matches_image_table_metadata(imgs):
    from simple_osm_queries_ray.sources.images import image_meta_table

    meta = image_meta_table(SF).to_pandas().sort_values("image_id").reset_index(drop=True)
    full = (
        imgs.to_pandas()[["image_id", "w", "h", "fmt", "caption"]]
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    assert meta.equals(full)
    assert "bytes" not in meta.columns


def test_thumb_table_plants_half_res_copies():
    from simple_osm_queries_ray.sources.images import (
        THUMB_OFFSET,
        thumb_image_meta_table,
    )

    df = thumb_image_meta_table(SF).to_pandas()
    ids = df["image_id"].str[3:].astype(int)
    base = df[ids < THUMB_OFFSET].set_index(ids[ids < THUMB_OFFSET])
    thumbs = df[ids >= THUMB_OFFSET].set_index(ids[ids >= THUMB_OFFSET] - THUMB_OFFSET)
    assert len(thumbs) == (base.index % 10 == 0).sum()
    joined = thumbs.join(base, lsuffix="_t", rsuffix="_b")
    assert (joined["w_t"] == joined["w_b"] // 2).all()
    assert (joined["h_t"] == joined["h_b"] // 2).all()
    assert (joined["caption_t"] == joined["caption_b"]).all()


def test_quality_filter_every_predicate_fires():
    """Each gate individually excludes at least one row at sf0.001 (the
    filter is not vacuous), and every surviving row satisfies all gates."""
    import pandas as pd

    from simple_osm_queries_ray.sources.images import image_meta_table
    from simple_osm_queries_ray.stages.image import quality_filter

    meta = image_meta_table(SF)
    all_df = meta.to_pandas()
    all_df["n_pixels"] = all_df["w"].astype(int) * all_df["h"].astype(int)
    all_df["caption_len"] = all_df["caption"].str.len()
    kept = quality_filter(meta).to_pandas()
    assert len(kept) > 0
    assert (kept["n_pixels"] >= 256).all()
    assert (3 * kept["h"] >= kept["w"]).all()
    assert (3 * kept["w"] >= kept["h"]).all()
    assert (kept["caption_len"] >= 20).all()
    # each predicate excludes something on its own
    assert (all_df["n_pixels"] < 256).any()
    assert ((3 * all_df["h"] < all_df["w"]) | (3 * all_df["w"] < all_df["h"])).any()
    assert (all_df["fmt"] == "jpeg").any()


def test_dedup_keep_largest_prefers_original_over_thumb():
    from simple_osm_queries_ray.sources.images import (
        THUMB_OFFSET,
        thumb_image_meta_table,
    )
    from simple_osm_queries_ray.stages.image import dedup_keep_largest

    tbl = thumb_image_meta_table(SF)
    out = dedup_keep_largest(tbl).to_pandas()
    ids = out["image_id"].str[3:].astype(int)
    # every winner is an original (thumbnails always lose on n_pixels)
    assert (ids < THUMB_OFFSET).all()
    # group sizes: 2 for planted-duplicate captions, 1 otherwise
    n_base = tbl.to_pandas()
    base_ids = n_base["image_id"].str[3:].astype(int)
    n_orig = (base_ids < THUMB_OFFSET).sum()
    n_thumb = (base_ids >= THUMB_OFFSET).sum()
    assert len(out) == n_orig  # one survivor per distinct caption
    assert (out["n_dups"] == 2).sum() == n_thumb


def test_curation_pipeline_deterministic_and_gated():
    """Alignment scoring must be deterministic across runs (every actor
    builds the same seeded towers) and the composite must only score
    quality-gate survivors (gate ordering is the pipeline's point)."""
    from simple_osm_queries_ray.sources.images import image_meta_table
    from simple_osm_queries_ray.stages.image import curation_pipeline, quality_filter

    sf = "/root/testdata/sf0.001"
    a = curation_pipeline(sf).to_pandas().sort_values("image_id").reset_index(drop=True)
    b = curation_pipeline(sf).to_pandas().sort_values("image_id").reset_index(drop=True)
    assert len(a) > 0
    assert (a["image_id"] == b["image_id"]).all()
    assert np.allclose(a["align_score"], b["align_score"], rtol=0, atol=0)
    assert (a["align_score"].abs() <= 1.0 + 1e-12).all()
    gated = set(
        quality_filter(image_meta_table(sf)).to_pandas()["image_id"]
    )
    assert set(a["image_id"]) <= gated and len(a) == len(gated)


def test_curation_pipeline_fallback_join_matches_broadcast():
    """Forced fallback (survivor_broadcast_limit=0) must route the survivor
    semi-join through the bucketed int64 hash join and keep EXACTLY the ids
    the broadcast tier keeps — the r03 audit flagged the unconditional
    driver pull; this pins the gate."""
    from simple_osm_queries_ray.stages.image import curation_pipeline

    sf = "/root/testdata/sf0.001"
    bcast = curation_pipeline(sf).to_pandas().sort_values("image_id").reset_index(drop=True)
    fb = (
        curation_pipeline(sf, survivor_broadcast_limit=0)
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    assert list(fb.columns) == list(bcast.columns)
    assert (fb["image_id"] == bcast["image_id"]).all()
    assert np.allclose(fb["align_score"], bcast["align_score"], rtol=0, atol=0)


def test_image_job_wave_resume(tmp_path):
    """jobs/image_job.py resume: a crash that leaves one wave's directory on
    disk but unrecorded must be atomically replaced (no duplicated rows),
    and recorded waves must be skipped."""
    import glob
    import json
    import shutil
    import subprocess
    import sys

    import pyarrow.dataset as pads

    out = str(tmp_path / "curated")
    env = dict(__import__("os").environ)
    cmd = [sys.executable, "jobs/image_job.py", "--sf-dir", "/root/testdata/sf0.001",
           "--out-dir", out, "--waves", "4"]
    r1 = subprocess.run(cmd, capture_output=True, text=True, cwd="/root/repo", env=env)
    assert r1.returncode == 0, r1.stderr[-800:]
    m1 = json.loads(r1.stdout.strip().splitlines()[-1])
    total1 = sum(
        pads.dataset(d).count_rows() for d in glob.glob(f"{out}/wave=*")
    )
    # simulate a crash mid-wave-2: directory present, manifest not recorded
    man = json.load(open(f"{out}/manifest.json"))
    del man["waves"]["wave_2"]
    json.dump(man, open(f"{out}/manifest.json", "w"))
    r2 = subprocess.run(cmd, capture_output=True, text=True, cwd="/root/repo", env=env)
    assert r2.returncode == 0, r2.stderr[-800:]
    m2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert m2["waves_skipped"] == 3
    total2 = sum(
        pads.dataset(d).count_rows() for d in glob.glob(f"{out}/wave=*")
    )
    assert total2 == total1  # no duplication, full coverage
