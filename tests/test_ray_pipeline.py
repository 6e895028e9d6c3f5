"""Ray Data pipeline integration tests (sf0.001 testdata)."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def test_transcript_pipeline_end_to_end(ray_session, tmp_path):
    from unfurl_ray.engine.pipeline import run_pipeline
    from unfurl_ray.sources.transcripts import build_transcripts
    import glob
    import ray.data as rd

    tdir = str(tmp_path / "transcripts")
    build_transcripts(SF).write_parquet(tdir)
    manifest = run_pipeline(
        sorted(glob.glob(f"{tdir}/*.parquet")),
        str(tmp_path / "out"),
        concurrency=2,
        files_per_partition=4,
        resume=True,
        order=True,
    )
    assert manifest["partitions"]["part-00000"]["complete"]
    # The ordering contract is: path-sorted files, each an ordered,
    # contiguous (conv_id, turn_idx) range — read them in path order.
    import pyarrow.parquet as pq
    import pyarrow as pa

    files = sorted((tmp_path / "out" / "final").glob("*.parquet"))
    final = pa.concat_tables(
        [pq.read_table(f) for f in files]
    ).to_pandas()
    assert len(final) == 500
    # ordering: (conv_id, turn_idx) non-decreasing
    key = list(zip(final["conv_id"], final["turn_idx"]))
    assert key == sorted(key)
    assert (final["unfurl_type"] == "website").sum() > 300

    # re-run (resume): extraction skipped, final REPLACED not appended
    run_pipeline(
        sorted(glob.glob(f"{tdir}/*.parquet")),
        str(tmp_path / "out"),
        concurrency=2,
        files_per_partition=4,
        resume=True,
        order=True,
    )
    files2 = sorted((tmp_path / "out" / "final").glob("*.parquet"))
    total = sum(pq.read_metadata(f).num_rows for f in files2)
    assert total == 500


def test_resume_skips_finished_partitions(ray_session, tmp_path):
    from unfurl_ray.engine.pipeline import run_extraction_checkpointed

    out = str(tmp_path / "out2")
    m1 = run_extraction_checkpointed(
        [f"{SF}/documents.parquet"], out, concurrency=2
    )
    secs1 = m1["partitions"]["part-00000"]["seconds"]
    m2 = run_extraction_checkpointed(
        [f"{SF}/documents.parquet"], out, concurrency=2
    )
    # second run must not recompute (manifest entry identical object)
    assert m2["partitions"]["part-00000"]["seconds"] == secs1


def test_transcripts_deterministic(ray_session):
    from unfurl_ray.sources.transcripts import build_transcripts

    a = build_transcripts(SF).to_pandas()
    b = build_transcripts(SF).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    assert set(a.columns) == {"conv_id", "turn_idx", "role", "text",
                              "tool", "ts"}


def test_exact_dedup(ray_session):
    import ray.data as rd
    from unfurl_ray.ops.dedup import exact_dedup

    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": [1, 2, 3, 4], "text": ["a", "b", "a", "a"]}
    ))
    out = exact_dedup(ds).to_pandas().sort_values("doc_id")
    assert len(out) == 2
    dup = out[out["doc_id"] == 1]["dup_count"].iloc[0]
    assert dup == 3


def test_minhash_finds_near_dups(ray_session):
    import ray.data as rd
    from unfurl_ray.ops.dedup import minhash_dedup_pairs

    # realistic near-dup: one word changed in a long distinct text
    # (tiny shingle sets make LSH banding a coin flip by design)
    words = [f"word{i}" for i in range(60)]
    base = " ".join(words)
    near = base.replace("word30", "changed")
    other = " ".join(f"other{i}" for i in range(60))
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": [base, near, other]}
    ))
    pairs = minhash_dedup_pairs(ds, threshold=0.5)
    assert ((pairs["id_a"] == 1) & (pairs["id_b"] == 2)).any()
    assert not ((pairs["id_b"] == 3) | (pairs["id_a"] == 3)).any()


def test_minhash_distributed_verify_parity(ray_session):
    """The distributed verify stage (semi-join + broadcast shingle
    sets) must return exactly the pairs a single-process reference
    computation (same banding, driver-side ngram_jaccard) produces."""
    from itertools import combinations

    import pyarrow.parquet as pq
    import ray.data as rd
    import zlib

    from unfurl_ray.ops.dedup import (
        N_BANDS,
        ROWS_PER_BAND,
        minhash_dedup_pairs,
        minhash_signature,
        ngram_jaccard,
    )

    docs = pq.read_table(
        "/root/testdata/sf0.01/documents.parquet",
        columns=["doc_id", "text"],
    ).to_pandas()
    ds = rd.from_pandas(docs)
    got = minhash_dedup_pairs(ds, threshold=0.8)

    # single-process reference: bucket by (band, band_hash), all-pairs
    # within buckets, verify with exact n-gram Jaccard
    buckets: dict = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        sig = minhash_signature(text or "")
        for band in range(N_BANDS):
            chunk = sig[band * ROWS_PER_BAND: (band + 1) * ROWS_PER_BAND]
            buckets.setdefault(
                (band, zlib.crc32(chunk.tobytes())), []
            ).append(int(doc_id))
    cand = {
        pair
        for ids in buckets.values() if len(ids) > 1
        for pair in combinations(sorted(set(ids)), 2)
    }
    texts = dict(zip(docs["doc_id"].astype(int), docs["text"]))
    want = sorted(
        (a, b, round(j, 4))
        for a, b in cand
        if (j := ngram_jaccard(texts[a] or "", texts[b] or "")) >= 0.8
    )
    assert (
        list(map(tuple, got[["id_a", "id_b", "jaccard"]].itertuples(
            index=False))) == want
    )
    assert len(want) > 0  # sf0.01 has planted near-dups


def test_knn_brute_self_similarity(ray_session):
    import ray.data as rd
    from unfurl_ray.ops.similarity import knn_brute

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(50, 8)).astype(np.float32)
    ds = rd.from_pandas(pd.DataFrame(
        {"vec_id": np.arange(50, dtype=np.int64),
         "embedding": list(vecs)}
    ))
    out = knn_brute(ds, vecs[:3], k=5)
    for qi in range(3):
        top = out[out["query_id"] == qi].iloc[0]
        assert top["vec_id"] == qi  # self is nearest
        assert abs(top["cosine"] - 1.0) < 1e-6


def test_ivf_index_partition_pruned_search(ray_session, tmp_path):
    """IvfIndex materializes the corpus hive-partitioned by centroid
    and a search reads ONLY the nprobe probed partition dirs."""
    import os

    import ray.data as rd

    from unfurl_ray.ops.similarity import IvfIndex, knn_brute

    ds = rd.read_parquet(
        f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    queries = np.array(
        ds.limit(4).to_pandas()["embedding"].tolist(), dtype=np.float64
    )
    idx_path = str(tmp_path / "ivf")
    index = IvfIndex.build(ds, idx_path, n_centroids=8)

    part_dirs = [
        d for d in os.listdir(idx_path) if d.startswith("centroid_id=")
    ]
    assert len(part_dirs) > 1  # real hive partitioning on disk

    wanted = index.probe_partitions(queries, nprobe=2)
    assert 0 < len(wanted) < len(part_dirs) + 1
    # pruned I/O: probed partitions hold strictly fewer rows/bytes
    import pyarrow.parquet as pq

    def dir_rows(d):
        return sum(
            pq.read_metadata(os.path.join(idx_path, d, f)).num_rows
            for f in os.listdir(os.path.join(idx_path, d))
        )

    probed_rows = sum(dir_rows(f"centroid_id={c}") for c in wanted
                      if os.path.isdir(os.path.join(
                          idx_path, f"centroid_id={c}")))
    total_rows = sum(dir_rows(d) for d in part_dirs)
    assert probed_rows < total_rows

    got = index.search(queries, k=10, nprobe=2)
    # recall vs brute force: IVF with nprobe=2/8 should recover most
    exact = knn_brute(ds, queries, k=10)
    recall = 0.0
    for qi in range(len(queries)):
        g = set(got[got["query_id"] == qi]["vec_id"])
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        recall += len(g & e) / max(1, len(e))
    recall /= len(queries)
    assert recall >= 0.5
    # reload round-trips
    again = IvfIndex.load(idx_path).search(queries, k=10, nprobe=2)
    pd.testing.assert_frame_equal(got, again)


def test_cosine_pairs_bucketed_vs_exact(ray_session):
    """The bucketed (no-broadcast) near-dup path: exact precision —
    every emitted pair really has cosine >= threshold and appears in
    the exact broadcast baseline — and high recall at assign_top=2."""
    import ray.data as rd

    from unfurl_ray.ops.similarity import (
        cosine_pair_dedup,
        cosine_pairs_bucketed,
    )

    ds = rd.read_parquet(
        "/root/testdata/sf0.01/embeddings.parquet",
        columns=["vec_id", "embedding"],
    )
    exact = cosine_pair_dedup(ds, threshold=0.45).to_pandas()
    exact_pairs = set(zip(exact["vec_a"], exact["vec_b"]))
    got = cosine_pairs_bucketed(
        ds, threshold=0.45, n_centroids=8, assign_top=2
    ).to_pandas()
    got_pairs = set(zip(got["vec_a"].astype(int), got["vec_b"].astype(int)))
    assert exact_pairs  # the testdata plants near-dups
    assert got_pairs <= exact_pairs  # exact precision
    recall = len(got_pairs & exact_pairs) / len(exact_pairs)
    assert recall >= 0.7


def test_multimodal_image_meta(ray_session):
    import ray.data as rd
    import struct
    from unfurl_ray.ops.multimodal import image_meta_pipeline

    png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
           + struct.pack(">IIBBBBB", 640, 480, 8, 2, 0, 0, 0))
    ds = rd.from_items([
        {"item_id": 1, "content": png},
        {"item_id": 2, "content": b"notanimage"},
    ])
    out = image_meta_pipeline(ds, concurrency=1).to_pandas()
    meta = out.sort_values("item_id")["image_meta"].tolist()
    assert meta[0]["format"] == "image/png"
    assert meta[0]["width"] == 640 and meta[0]["height"] == 480
    assert meta[1]["format"] is None


def test_sessionize_gap_logic(ray_session):
    import ray.data as rd
    from unfurl_ray.ops.relational import sessionize

    ts = pd.to_datetime(
        ["2024-01-01 00:00", "2024-01-01 00:10",  # session 1
         "2024-01-01 01:00",                      # session 2 (gap 50m)
         "2024-01-01 01:20"]                      # still session 2
    )
    ds = rd.from_pandas(pd.DataFrame({"user_id": [1, 1, 1, 1], "ts": ts}))
    out = sessionize(ds, "ts", "user_id", gap_s=1800).to_pandas()
    assert len(out) == 2
    assert sorted(out["n_events"].tolist()) == [2, 2]


def test_sessionize_hot_key_multiblock(ray_session):
    """Skew drill: one key's events span MANY blocks (the exact case
    the old one-group-per-key sessionize could not hold at scale) —
    the two-phase fragment merge must produce the same sessions a
    single-partition pandas pass would."""
    import ray.data as rd
    from unfurl_ray.ops.relational import sessionize

    rng = np.random.default_rng(7)
    # 20k events for ONE user: bursts of ~5min activity separated by
    # >30min gaps, plus a second small user as a control
    n_sessions, per = 40, 500
    starts = np.arange(n_sessions) * 10_000  # seconds, gaps >> 1800
    ts = np.concatenate(
        [s + np.sort(rng.integers(0, 300, per)) for s in starts]
    )
    df = pd.DataFrame(
        {
            "user_id": np.r_[np.full(len(ts), 1), [2, 2]],
            "ts": pd.to_datetime(
                np.r_[ts, [0, 50_000]], unit="s"
            ),
        }
    )
    # shuffle row order then split into many blocks so the hot key is
    # scattered across batches
    df = df.sample(frac=1.0, random_state=3).reset_index(drop=True)
    ds = rd.from_pandas(df).repartition(16)
    out = sessionize(ds, "ts", "user_id", gap_s=1800).to_pandas()

    hot = out[out["user_id"] == 1].sort_values("session_idx")
    assert len(hot) == n_sessions
    assert hot["n_events"].tolist() == [per] * n_sessions
    # session bounds match the exact per-burst min/max
    assert (
        hot["session_start"].astype("int64").to_numpy() // 10**9
        == [ts[i * per] for i in range(n_sessions)]
    ).all()
    assert len(out[out["user_id"] == 2]) == 2


def test_grouped_quantile_sketch_all_null_key(ray_session):
    """A key whose values are ALL null must not crash the job (empty
    sketch -> NaN quantiles), mirroring approx_quantiles' guard."""
    import ray.data as rd
    from unfurl_ray.ops.sketch import grouped_approx_quantiles

    df = pd.DataFrame(
        {
            "k": ["a"] * 5 + ["b"] * 5,
            "v": [1.0, 2, 3, 4, 5] + [np.nan] * 5,
        }
    )
    out = (
        grouped_approx_quantiles(rd.from_pandas(df), "k", "v", qs=(0.5,))
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert len(out) == 2
    assert out.loc[0, "q_0.5"] == 3.0
    assert np.isnan(out.loc[1, "q_0.5"])


def test_multimodal_audio_and_frames(ray_session):
    import ray.data as rd
    from unfurl_ray.ops.multimodal import (
        audio_meta_pipeline, frame_sample_pipeline, sniff_wav,
    )

    # 1 channel, 8000 Hz, 16-bit PCM, 16000 bytes of data -> 1000 ms
    fmt = (b"fmt " + (16).to_bytes(4, "little")
           + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
           + (8000).to_bytes(4, "little") + (16000).to_bytes(4, "little")
           + (2).to_bytes(2, "little") + (16).to_bytes(2, "little"))
    data = b"data" + (16000).to_bytes(4, "little") + b"\x00" * 16000
    wav = b"RIFF" + (4 + len(fmt) + len(data)).to_bytes(4, "little") + b"WAVE" + fmt + data
    meta = sniff_wav(wav)
    assert meta["sample_rate"] == 8000 and meta["duration_ms"] == 1000

    ds = rd.from_items([
        {"item_id": 1, "content": wav},
        {"item_id": 2, "content": b"mp3?"},
    ])
    out = audio_meta_pipeline(ds, concurrency=1).to_pandas()
    metas = out.sort_values("item_id")["audio_meta"].tolist()
    assert metas[0]["duration_ms"] == 1000 and metas[0]["channels"] == 1
    assert metas[1]["format"] is None

    vid = bytes(range(256)) * 16  # 4 KiB fake video payload
    ds2 = rd.from_items([{"item_id": 1, "content": vid}])
    frames = frame_sample_pipeline(ds2, concurrency=1, n_frames=4).to_pandas()
    fr = frames["frames"][0]
    assert len(fr) == 4
    assert fr[0]["frame_idx"] == 0 and len(fr[0]["data"]) == 64
    assert fr[1]["ts_ms"] > fr[0]["ts_ms"]


def test_multimodal_resize_stub_contract(ray_session):
    import pytest
    import ray.data as rd
    from unfurl_ray.ops.multimodal import DecodeBackend, ImageResize

    # default backend: clearly-marked NotImplementedError (no codec)
    with pytest.raises(NotImplementedError):
        ImageResize()._resize_one(b"\x89PNG....")

    class FakeBackend(DecodeBackend):
        def decode_pixels(self, data: bytes):
            return data * 2

    ds = rd.from_items([{"item_id": 1, "content": b"ab" * 64}])
    out = ds.map_batches(
        ImageResize,
        fn_constructor_kwargs={"width": 8, "height": 8,
                               "backend": FakeBackend()},
        batch_format="pyarrow", concurrency=1,
    ).to_pandas()
    assert len(out["resized"][0]) == 64  # 8x8 contract
    assert out["resized_meta"][0]["width"] == 8


def test_embedding_cosine_pairs(ray_session):
    import ray.data as rd
    from unfurl_ray.ops.similarity import cosine_pair_dedup

    base = np.array([1.0, 0.0, 0.0, 0.0])
    vecs = [base, base * 3.0,                      # exact dup (cos 1.0)
            np.array([0.9, 0.1, 0.0, 0.0]),        # near dup
            np.array([0.0, 1.0, 0.0, 0.0])]        # orthogonal
    ds = rd.from_pandas(pd.DataFrame(
        {"vec_id": np.arange(4, dtype=np.int64),
         "embedding": [v.astype(np.float32) for v in vecs]}
    ))
    out = cosine_pair_dedup(ds, threshold=0.9, concurrency=1).to_pandas()
    pairs = set(zip(out["vec_a"], out["vec_b"]))
    assert (0, 1) in pairs and (0, 2) in pairs and (1, 2) in pairs
    assert all(b != 3 and a != 3 for a, b in pairs)


def test_pdf_turns_extract_document_and_text(ray_session):
    from unfurl_ray.engine.pipeline import extract_turns
    from unfurl_ray.sources.transcripts import build_transcripts

    ds = build_transcripts("/root/testdata/sf0.001", shuffled=False)
    out = extract_turns(ds, concurrency=2).to_pandas()
    pdfs = out[out["mime"] == "application/pdf"]
    assert len(pdfs) > 0
    assert (pdfs["unfurl_type"] == "document").all()
    with_text = pdfs[pdfs["main_text"].str.len() > 0]
    assert len(with_text) == len(pdfs)
    row = with_text.iloc[0]
    assert row["main_text"].startswith("Doc ")
    assert row["spans"][0]["kind"] == "pdf_text"
    assert row["headline"] is not None  # /Title Info metadata flows


def test_salted_groupby_matches_unsalted(ray_session):
    """Full skew drill: find hot keys -> salt -> per-(key,salt) partial
    -> merge == plain groupby result."""
    import ray.data as rd
    from ray.data.aggregate import Sum
    from unfurl_ray.ops.skew import add_salt, find_hot_keys

    rows = (
        [{"conv_id": "hot", "turn_idx": i, "v": 1} for i in range(500)]
        + [{"conv_id": f"c{i % 20}", "turn_idx": i, "v": 1}
           for i in range(200)]
    )
    ds = rd.from_items(rows)
    hot = find_hot_keys(ds, "conv_id", threshold=100)
    assert hot == {"hot"}

    salted = add_salt(ds, "conv_id", hot, n_salt=4, order_col="turn_idx")
    sub = (
        salted.groupby(["conv_id", "salt"])
        .aggregate(Sum("v", alias_name="n"))
        .to_pandas()
    )
    # hot key spread across >1 salt partitions
    assert sub[sub["conv_id"] == "hot"]["salt"].nunique() > 1
    merged = sub.groupby("conv_id", as_index=False)["n"].sum()
    plain = (
        ds.groupby("conv_id").aggregate(Sum("v", alias_name="n"))
        .to_pandas()
    )
    assert (
        merged.sort_values("conv_id").reset_index(drop=True)["n"].tolist()
        == plain.sort_values("conv_id").reset_index(drop=True)["n"].tolist()
    )


def test_hll_distinct_accuracy(ray_session):
    import ray.data as rd
    from unfurl_ray.ops.sketch import hll_distinct

    n = 20000
    ds = rd.from_pandas(pd.DataFrame({"k": np.arange(n) % 5000}))
    est = hll_distinct(ds, "k", p=12)
    assert abs(est - 5000) / 5000 < 0.05  # ~1.6% stderr at p=12


def test_quantile_sketch_rank_error(ray_session):
    """Mergeable quantile sketch: rank error vs exact < 1% on real
    multi-block input (two merge levels exercised)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from unfurl_ray.ops.sketch import approx_quantiles

    exact = np.sort(
        pq.read_table(f"{SF}/events.parquet", columns=["value"])
        .column("value").to_numpy(zero_copy_only=False)
    )
    ds = rd.read_parquet(
        f"{SF}/events.parquet", columns=["value"]
    ).repartition(8)  # force multiple sketch folds + a real tree merge
    est = approx_quantiles(ds, "value", qs=(0.5, 0.95, 0.99))
    for q in (0.5, 0.95, 0.99):
        rank = np.searchsorted(exact, est[q]) / len(exact)
        assert abs(rank - q) < 0.01, (q, est[q], rank)


def test_grouped_quantile_sketch_rank_error(ray_session):
    """Per-key sketch quantiles within 1% rank error of each key's
    exact distribution."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from unfurl_ray.ops.sketch import grouped_approx_quantiles

    t = pq.read_table(
        f"{SF}/events.parquet", columns=["event_type", "value"]
    ).to_pandas()
    ds = rd.read_parquet(
        f"{SF}/events.parquet", columns=["event_type", "value"]
    ).repartition(8)
    got = grouped_approx_quantiles(
        ds, "event_type", "value", qs=(0.5, 0.95)
    ).to_pandas()
    assert set(got["event_type"]) == set(t["event_type"])
    for _, row in got.iterrows():
        exact = np.sort(
            t.loc[t["event_type"] == row["event_type"], "value"].to_numpy()
        )
        for q, col in ((0.5, "q_0.5"), (0.95, "q_0.95")):
            rank = np.searchsorted(exact, row[col]) / len(exact)
            assert abs(rank - q) < 0.01, (row["event_type"], q, rank)


def test_bloom_semi_join_exact(ray_session):
    import ray.data as rd
    from unfurl_ray.ops.sketch import BloomFilter, bloom_semi_join

    bf = BloomFilter(1000, fp_rate=0.01)
    bf.add(list(range(1000)))
    hits = bf.contains(list(range(1000)))
    assert hits.all()  # no false negatives, ever
    fp = bf.contains(list(range(10_000, 30_000))).mean()
    assert fp < 0.03  # ~target fp rate

    ds = rd.from_pandas(pd.DataFrame({"k": np.arange(500), "v": 1}))
    keys = set(range(0, 500, 7))
    semi = bloom_semi_join(ds, keys, on="k", concurrency=1).to_pandas()
    assert set(semi["k"]) == keys  # exact despite the Bloom prefilter
    anti = bloom_semi_join(ds, keys, on="k", anti=True,
                           concurrency=1).to_pandas()
    assert set(anti["k"]) == set(range(500)) - keys


def test_snippet_dedup_cache(ray_session):
    import ray.data as rd
    from unfurl_ray.ops.dedup import snippet_dedup

    rows = [{"i": i, "text": f"doc {i % 10}  body"} for i in range(50)]
    ds = rd.from_items(rows)
    out = snippet_dedup(ds, concurrency=1).to_pandas().sort_values("i")
    # 10 distinct snippets -> first occurrence unique, rest flagged
    assert (~out["is_dup_snippet"]).sum() == 10
    assert out["is_dup_snippet"].sum() == 40
    # whitespace/case-normalized: "DOC 3 body" is a dup of "doc 3  body"
    ds2 = rd.from_items(
        [{"i": 0, "text": "doc 3  body"}, {"i": 1, "text": "DOC 3 body"}]
    )
    out2 = snippet_dedup(ds2, concurrency=1).to_pandas().sort_values("i")
    # block ARRIVAL order at the actor is nondeterministic under load,
    # so assert the normalization property (exactly one flagged), not
    # which of the two arrived first
    assert sorted(out2["is_dup_snippet"].tolist()) == [False, True]


def test_extract_turns_never_fails_a_row(ray_session):
    import ray.data as rd
    from unfurl_ray.engine.stages import ExtractTurns

    nasty = [
        {"conv_id": "c", "turn_idx": 0, "text": None},
        {"conv_id": "c", "turn_idx": 1, "text": ""},
        {"conv_id": "c", "turn_idx": 2, "text": "\x00\ud800loose<<<>>>"
            if False else "\x00<<<~garbage~>>>"},
        {"conv_id": "c", "turn_idx": 3,
         "text": "<html><head><title>" + "x" * 100_000},  # unterminated
        {"conv_id": "c", "turn_idx": 4, "text": "<" * 5000},
        {"conv_id": "c", "turn_idx": 5,
         "text": "%PDF-1.4\nstream\n" + "(" * 2000},  # broken pdf
        {"conv_id": "c", "turn_idx": 6,
         "text": "<div>" * 3000 + "deep"},  # deep nesting
    ]
    out = (
        rd.from_items(nasty)
        .map_batches(ExtractTurns, batch_format="pyarrow", concurrency=1)
        .to_pandas()
    )
    assert len(out) == len(nasty)  # every row survived
    assert out["unfurl_json"].notna().all()


def test_resume_recomputes_on_input_change(ray_session, tmp_path):
    import glob

    from unfurl_ray.engine.pipeline import run_extraction_checkpointed
    from unfurl_ray.sources.transcripts import build_transcripts

    tdir = str(tmp_path / "t")
    build_transcripts(SF, shuffled=False).write_parquet(tdir)
    files = sorted(glob.glob(f"{tdir}/*.parquet"))
    out = str(tmp_path / "out3")
    m1 = run_extraction_checkpointed(files, out, concurrency=2)

    # move the first input file's fingerprint by a sub-second mtime
    # bump (fingerprint uses st_mtime_ns — same-second rewrites count)
    import os
    st = os.stat(files[0])
    os.utime(files[0], ns=(st.st_atime_ns, st.st_mtime_ns + 1_000))

    m2 = run_extraction_checkpointed(files, out, concurrency=2)
    # changed partition recomputed: its recorded input fingerprint now
    # reflects the new mtime (timing comparison would be flaky)
    assert (
        m2["partitions"]["part-00000"]["inputs"][files[0]]
        != m1["partitions"]["part-00000"]["inputs"][files[0]]
    )
    if len(files) > 1:
        assert (
            m2["partitions"]["part-00001"]["inputs"]
            == m1["partitions"]["part-00001"]["inputs"]
        )
    # the recomputed partition must be REPLACED, not appended to: row
    # count (manifest + on-disk) unchanged after the forced recompute
    import pyarrow.parquet as pq

    rows_disk = sum(
        pq.read_metadata(f).num_rows
        for f in (tmp_path / "out3" / "extracted" / "part-00000").glob(
            "*.parquet"
        )
    )
    assert rows_disk == m1["partitions"]["part-00000"]["rows"]
    assert (
        m2["partitions"]["part-00000"]["rows"]
        == m1["partitions"]["part-00000"]["rows"]
    )


def test_stale_partition_dirs_not_merged(ray_session, tmp_path):
    """Final output is built from the manifest's partitions only; a
    stale extracted/<dir> from an older layout must not leak in, and a
    resume=False rerun clears the extracted dir."""
    import glob

    import pyarrow.parquet as pq

    from unfurl_ray.engine.pipeline import run_pipeline
    from unfurl_ray.sources.transcripts import build_transcripts

    tdir = str(tmp_path / "t")
    build_transcripts(SF, shuffled=False).write_parquet(tdir)
    files = sorted(glob.glob(f"{tdir}/*.parquet"))
    out = tmp_path / "out4"
    run_pipeline(files, str(out), concurrency=2, resume=True, order=False)
    n1 = sum(
        pq.read_metadata(f).num_rows for f in (out / "final").glob("*.parquet")
    )

    # plant a stale partition dir (old layout) with a rogue file
    stale = out / "extracted" / "part-zz-stale"
    stale.mkdir()
    src = next((out / "extracted" / "part-00000").glob("*.parquet"))
    (stale / "rogue.parquet").write_bytes(src.read_bytes())

    run_pipeline(files, str(out), concurrency=2, resume=True, order=False)
    n2 = sum(
        pq.read_metadata(f).num_rows for f in (out / "final").glob("*.parquet")
    )
    assert n2 == n1  # stale dir ignored by the manifest-driven glob

    # resume=False rerun: extracted/ cleared, stale dir gone, count same
    run_pipeline(files, str(out), concurrency=2, resume=False, order=False)
    assert not stale.exists()
    n3 = sum(
        pq.read_metadata(f).num_rows for f in (out / "final").glob("*.parquet")
    )
    assert n3 == n1


def test_shrunk_input_prunes_stale_partitions(ray_session, tmp_path):
    """Resuming with FEWER input files must drop the now-out-of-range
    partitions from the manifest and disk (not merge them)."""
    import glob

    import pyarrow.parquet as pq

    from unfurl_ray.engine.pipeline import run_pipeline
    from unfurl_ray.sources.transcripts import build_transcripts

    tdir = str(tmp_path / "t")
    build_transcripts(SF, shuffled=False).repartition(4).write_parquet(tdir)
    files = sorted(glob.glob(f"{tdir}/*.parquet"))
    assert len(files) >= 2
    out = tmp_path / "out5"
    m1 = run_pipeline(files, str(out), concurrency=2, resume=True,
                      order=False)
    n_parts1 = len(m1["partitions"])

    shrunk = files[:1]
    m2 = run_pipeline(shrunk, str(out), concurrency=2, resume=True,
                      order=False)
    assert len(m2["partitions"]) == 1 < n_parts1
    rows_final = sum(
        pq.read_metadata(f).num_rows for f in (out / "final").glob("*.parquet")
    )
    assert rows_final == pq.read_metadata(shrunk[0]).num_rows


def test_connected_components_basic(ray_session):
    """Chain, triangle, singleton-with-self-edge, and a 2-node comp:
    labels converge to the min node id of each component."""
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.graph import connected_components

    # undirected edges given both directions: 1-2-3-4 chain (diameter 3
    # exercises >1 propagation round), 10-11, triangle 20-21-22
    und = [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)]
    edges = pd.DataFrame(
        {"u": [a for a, b in und] + [b for a, b in und],
         "v": [b for a, b in und] + [a for a, b in und]}
    )
    want = {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}
    # distributed fixpoint path (forced — the auto threshold would
    # route a graph this small to the driver union-find)
    labels = connected_components(
        rd.from_pandas(edges), num_partitions=2, distributed=True
    )
    got = labels.to_pandas().sort_values("node").reset_index(drop=True)
    assert dict(zip(got["node"], got["label"])) == want
    # driver union-find path: identical output
    uf = connected_components(rd.from_pandas(edges), distributed=False)
    uf = uf.sort_values("node").reset_index(drop=True)
    assert dict(zip(uf["node"], uf["label"])) == want


def test_fingerprint_edges_and_assignment(ray_session):
    """Docs sharing an aligned 64-char chunk become one cluster;
    transitive sharing merges clusters; unrelated docs stay singletons."""
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.graph import (
        assign_components, connected_components, fingerprint_edges,
    )

    blk_a = "a" * 64
    blk_b = "b" * 64
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": [
                blk_a + "tail zero",
                blk_a + blk_b,      # shares chunk 0 with doc 0
                blk_b + "unrelated suffix of doc two",  # chunk 0 = blk_b
                "completely different text " * 4,
                None,
            ],
        }
    )
    # doc2's chunk0 is blk_b; doc1's chunk1 is blk_b -> but alignment
    # matters: doc1 chunk1 vs doc2 chunk0 are DIFFERENT positions yet
    # identical content -> edges connect on content alone.
    ds = rd.from_pandas(docs)
    edges = fingerprint_edges(ds, chunk_size=64)
    labels = connected_components(edges)
    out = assign_components(ds, labels).to_pandas()
    comp = dict(zip(out["doc_id"], out["component"]))
    assert comp[0] == comp[1] == comp[2] == 0  # 0-1 share, 1-2 share
    assert comp[3] == 3 and comp[4] == 4       # singletons keep own id


def test_connected_components_no_pointer_jump(ray_session):
    """Propagation-only convergence (pointer_jump=False): near-clique
    clusters close in diameter rounds and match the driver path."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.graph import connected_components

    base = np.arange(50, dtype=np.int64) * 4
    u = np.concatenate([base, base + 1, base + 2])
    v = np.concatenate([base + 1, base + 2, base + 3])
    edges = pd.DataFrame(
        {"u": np.concatenate([u, v]), "v": np.concatenate([v, u])}
    )
    ds = rd.from_pandas(edges).repartition(3)
    got = (
        connected_components(
            ds, num_partitions=3, distributed=True, pointer_jump=False
        )
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    want = connected_components(ds, distributed=False)
    want = want.sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert (got["label"].to_numpy()
            == (got["node"].to_numpy() // 4) * 4).all()


def test_assign_components_join_fallback_parity(ray_session):
    """broadcast_limit=0 forces the bucketed left-hash-join path; it
    must produce exactly the broadcast searchsorted path's output,
    including untouched singletons."""
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.graph import assign_components

    docs = pd.DataFrame({"doc_id": list(range(40))})
    labels = pd.DataFrame(
        {"node": [3, 7, 11, 25], "label": [3, 3, 3, 25]}
    )
    ds = rd.from_pandas(docs).repartition(4)
    want = (
        assign_components(ds, labels)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    got = (
        assign_components(ds, labels, broadcast_limit=0)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert want.loc[want["doc_id"] == 7, "component"].item() == 3
    assert want.loc[want["doc_id"] == 8, "component"].item() == 8


def test_semdedup_bucketed_path_parity(ray_session):
    """Above exact_pair_limit the pair stage flips to the bucketed
    centroid-LSH path; on planted near-identical clusters it finds
    the same components as the exact broadcast path."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.pipelines import semdedup

    rng = np.random.default_rng(7)
    base = rng.normal(size=(6, 16)).astype(np.float32)
    rows = []
    for vid in range(60):
        proto = base[vid % 6]
        vec = proto + rng.normal(scale=0.01, size=16).astype(np.float32)
        rows.append({"vec_id": vid, "embedding": vec.tolist()})
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(4).materialize()

    exact = semdedup(ds, threshold=0.9, exact_pair_limit=10**9)
    bucketed = semdedup(
        ds, threshold=0.9, exact_pair_limit=0,
        n_centroids=6, assign_top=3,
    )
    pd.testing.assert_frame_equal(bucketed, exact)
    # six planted clusters of ten -> six kept representatives
    assert int(exact["kept"].sum()) == 6


def test_connected_components_capped_bucket(ray_session):
    """bucket_cap keeps hot fingerprints subquadratic but still chains
    every capped doc into one component."""
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.graph import (
        assign_components, connected_components, fingerprint_edges,
    )

    shared = "x" * 64
    docs = pd.DataFrame(
        {"doc_id": list(range(20)),
         "text": [shared + f"suffix {i}" for i in range(20)]}
    )
    ds = rd.from_pandas(docs)
    edges = fingerprint_edges(ds, chunk_size=64, bucket_cap=5)
    labels = connected_components(edges)
    out = assign_components(ds, labels).to_pandas()
    # capped: only the first 5 ids pair up; the rest are singletons —
    # honest documented behavior of the cap (sampled chaining)
    comp = dict(zip(out["doc_id"], out["component"]))
    assert all(comp[i] == 0 for i in range(5))


def test_simhash_scalar_batch_parity(ray_session):
    """add_simhash (vectorized) is bit-identical to simhash64 (scalar)
    modulo the int64 shift, including the empty-doc case."""
    import pandas as pd
    import pyarrow as pa

    from unfurl_ray.ops.dedup import add_simhash, simhash64

    texts = ["hello world hello", "", None, "one two three four five",
             "repeated repeated repeated word"]
    batch = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts, pa.string())})
    got = add_simhash(batch).column("simhash").to_pylist()
    for t, g in zip(texts, got):
        # scalar returns unsigned; batch emits signed (u - 2^63)
        assert g == simhash64(t or "") - (1 << 63)


def test_connected_components_distributed_moderate_scale(ray_session):
    """Distributed fixpoint on a 20k-node graph (4k clusters of 5 in a
    ring, so diameter 2 via the symmetric closure): converges to the
    per-cluster min and matches the driver union-find exactly."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.graph import connected_components

    n_clusters, size = 4_000, 5
    base = np.arange(n_clusters, dtype=np.int64) * size
    u = np.concatenate([base + i for i in range(size)])
    v = np.concatenate([base + ((i + 1) % size) for i in range(size)])
    edges = pd.DataFrame(
        {"u": np.concatenate([u, v]), "v": np.concatenate([v, u])}
    )
    ds = rd.from_pandas(edges)
    dist = connected_components(ds, num_partitions=4, distributed=True)
    dist = dist.to_pandas().sort_values("node").reset_index(drop=True)
    want = (dist["node"].to_numpy() // size) * size
    assert (dist["label"].to_numpy() == want).all()
    uf = connected_components(rd.from_pandas(edges), distributed=False)
    uf = uf.sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(dist, uf)


def test_read_transcripts_all_formats(ray_session, tmp_path):
    """JSONL and CSV transcript dumps normalize to the exact schema and
    values of the parquet path, and flow through extraction."""
    import pyarrow as pa
    import pyarrow.csv as pacsv
    import pyarrow.parquet as pq

    from unfurl_ray.engine.pipeline import extract_turns
    from unfurl_ray.sources.formats import SCHEMA, read_transcripts
    from unfurl_ray.sources.transcripts import build_transcripts

    tbl = pa.Table.from_pandas(
        build_transcripts(SF, shuffled=False).limit(40).to_pandas(),
        preserve_index=False,
    ).cast(SCHEMA)

    pq_path = str(tmp_path / "t.parquet")
    pq.write_table(tbl, pq_path)
    csv_path = str(tmp_path / "t.csv")
    pacsv.write_csv(tbl, csv_path)
    json_path = str(tmp_path / "t.json")
    tbl.to_pandas().assign(
        ts=lambda d: d["ts"].dt.strftime("%Y-%m-%d %H:%M:%S")
    ).to_json(json_path, orient="records", lines=True)

    def _canon(df):
        # parallel reads return blocks in nondeterministic order; the
        # source guarantees VALUES, not row order
        return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    base = _canon(read_transcripts(pq_path, "parquet").to_pandas())
    for fmt, path in (("csv", csv_path), ("jsonl", json_path)):
        got = _canon(read_transcripts(path, fmt).to_pandas())
        assert list(got.columns) == list(base.columns)
        # second-resolution ts round-trip for json; compare on floor(s)
        for col in ("conv_id", "turn_idx", "role", "text", "tool"):
            assert got[col].tolist() == base[col].tolist(), (fmt, col)
        assert (
            got["ts"].dt.floor("s").tolist()
            == base["ts"].dt.floor("s").tolist()
        ), fmt
    # and the normalized stream drives the real extraction stage
    out = extract_turns(
        read_transcripts(csv_path, "csv"), concurrency=1
    ).to_pandas()
    assert len(out) == 40 and "unfurl_type" in out.columns


def test_heavy_hitters_sketch(ray_session):
    """Zipf-ish stream with planted heavy items over a domain larger
    than the sketch capacity: the top-k recovered exactly, true counts
    inside [count_min, count_max], state capped at `capacity`."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.sketch import heavy_hitters

    rng = np.random.default_rng(11)
    heavy = [f"hot{i}" for i in range(10)]
    heavy_counts = {h: 3_000 - 200 * i for i, h in enumerate(heavy)}
    tail = [f"cold{i}" for i in rng.integers(0, 50_000, size=40_000)]
    stream = [h for h, n in heavy_counts.items() for _ in range(n)] + tail
    rng.shuffle(stream)
    ds = rd.from_pandas(pd.DataFrame({"item": stream})).repartition(16)

    out = heavy_hitters(ds, "item", k=10, capacity=512)
    assert list(out["value"]) == sorted(
        heavy, key=lambda h: (-heavy_counts[h], h)
    )
    true = pd.Series(stream).value_counts()
    for _, row in out.iterrows():
        assert row["count_min"] <= true[row["value"]] <= row["count_max"]


def test_repetition_metrics(ray_session):
    """Known-answer docs: a fully repeated doc, a no-repeat doc, a
    single word, and empty/null text."""
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.textstats import repetition_batch

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": [
                "spam spam spam spam",   # all one word
                "a b c d",               # no repetition
                "solo",                  # one word, no bigrams
                "",                      # empty
                None,                    # null
            ],
        }
    )
    out = (
        rd.from_pandas(docs)
        .repartition(3)
        .map_batches(repetition_batch, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_words"].tolist() == [4, 4, 1, 0, 0]
    assert out["dup_word_frac"].tolist() == [0.75, 0.0, 0.0, 0.0, 0.0]
    assert out["top_word_frac"].tolist() == [1.0, 0.25, 1.0, 0.0, 0.0]
    # "spam spam" fills all 3 bigram slots; distinct words have 1/3
    assert out["top_bigram_frac"].tolist() == [1.0, 0.3333, 0.0, 0.0, 0.0]


def test_pii_scrub_redacts_all_occurrences(ray_session):
    """Multiple emails/phones in one doc are all counted and all
    redacted (md5 of the expected redacted string matches)."""
    import hashlib

    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.textstats import pii_scrub_batch

    text = "mail a@b.com then b@c.org call +1-555-1234 or 44-555-0000"
    docs = pd.DataFrame({"doc_id": [7], "text": [text]})
    out = (
        rd.from_pandas(docs)
        .map_batches(pii_scrub_batch, batch_format="pyarrow")
        .to_pandas()
    )
    row = out.iloc[0]
    # +2 synthetic: the op appends ' contact: user7@example.com or
    # +1-555-0007' on every doc
    assert row["n_emails"] == 3 and row["n_phones"] == 3
    expect = (
        "mail <EMAIL> then <EMAIL> call <PHONE> or <PHONE>"
        " contact: <EMAIL> or <PHONE>"
    )
    assert row["scrubbed_md5"] == hashlib.md5(expect.encode()).hexdigest()


def test_ngram_decontaminate(ray_session):
    """Planted overlap: docs sharing a trigram with the benchmark are
    flagged with the right distinct-hit count; others are clean."""
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.dedup import ngram_decontaminate

    bench = pd.DataFrame(
        {"doc_id": [100], "text": ["the quick brown fox jumps"]}
    )
    corpus = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                # shares 'the quick brown' and 'quick brown fox'
                "saw the quick brown fox yesterday",
                "the quick brown",        # exactly one trigram, a hit
                "quick brown wolf runs",  # no full trigram overlap
                "to be or not to be",     # disjoint
            ],
        }
    )
    out = (
        ngram_decontaminate(
            rd.from_pandas(corpus).repartition(2),
            rd.from_pandas(bench),
            n=3,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_hits"].tolist() == [2, 1, 0, 0]
    assert out["contaminated"].tolist() == [True, True, False, False]


def test_pca_matches_numpy(ray_session):
    """Distributed-moments PCA == single-process numpy PCA (same
    sign convention) on a random low-rank-ish matrix."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.similarity import pca_fit, pca_project

    rng = np.random.default_rng(5)
    base = rng.normal(size=(400, 3)) @ rng.normal(size=(3, 16))
    x = (base + 0.01 * rng.normal(size=(400, 16))).astype(np.float32)
    df = pd.DataFrame(
        {"vec_id": np.arange(400), "embedding": list(x)}
    )
    ds = rd.from_pandas(df).repartition(8)

    model = pca_fit(ds, k=3)
    xc = x.astype(np.float64) - x.astype(np.float64).mean(axis=0)
    w, v = np.linalg.eigh(np.cov(x.T.astype(np.float64), bias=True))
    order = np.argsort(w)[::-1][:3]
    ref = v[:, order]
    for j in range(3):
        i = np.argmax(np.abs(ref[:, j]))
        if ref[i, j] < 0:
            ref[:, j] = -ref[:, j]
    assert np.allclose(model["components"], ref, atol=1e-8)
    assert np.allclose(
        model["explained_variance"], np.sort(w)[::-1][:3], atol=1e-8
    )
    out = (
        pca_project(ds, model)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    proj = xc @ ref
    assert np.allclose(out[["pc1", "pc2", "pc3"]].to_numpy(), proj,
                       atol=1e-8)


def test_quantize_embeddings_roundtrip(ray_session):
    """int8 codes reconstruct within half a quantization step per dim,
    and extremes map to the code range ends."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.similarity import quantize_embeddings

    rng = np.random.default_rng(9)
    x = rng.normal(size=(300, 8)).astype(np.float32)
    ds = rd.from_pandas(
        pd.DataFrame({"vec_id": np.arange(300), "embedding": list(x)})
    ).repartition(4)
    out = (
        quantize_embeddings(ds)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    q = np.stack(out["qvec"].to_numpy()).astype(np.int64)
    assert q.min() == -128 and q.max() == 127  # extremes hit the ends
    mn = x.min(axis=0).astype(np.float64)
    span = (x.max(axis=0) - x.min(axis=0)).astype(np.float64)
    recon = mn + (q + 128) / 255.0 * span
    assert np.abs(recon - x.astype(np.float64)).max() <= (
        span.max() / 255.0 / 2 + 1e-12
    )


def test_connected_components_long_chain(ray_session):
    """A 512-node path graph (diameter 511) must converge within the
    32-round cap — only pointer jumping (O(log d) rounds) can; plain
    min-label propagation would need 511 rounds."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.graph import connected_components

    n = 512
    u = np.arange(n - 1, dtype=np.int64)
    edges = pd.DataFrame(
        {"u": np.concatenate([u, u + 1]),
         "v": np.concatenate([u + 1, u])}
    )
    labels = connected_components(
        rd.from_pandas(edges).repartition(4),
        num_partitions=4,
        max_iters=12,
        distributed=True,
    ).to_pandas()
    assert len(labels) == n
    assert (labels["label"] == 0).all()


def test_pack_shards_offset_split(ray_session):
    """Offset-split packing: a row starting at offset c goes to shard
    c // budget; boundary rows spill rather than opening a new shard."""
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.relational import pack_shards

    df = pd.DataFrame(
        {"doc_id": [0, 1, 2, 3], "w": [900, 900, 900, 300]}
    )
    out = (
        pack_shards(rd.from_pandas(df).repartition(2), "w",
                    budget=1000, n_buckets=1)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["shard_idx"].tolist() == [0, 0, 1, 2]
    assert out["shard_offset"].tolist() == [0, 900, 800, 700]
    assert (out["bucket"] == 0).all()


def test_lag_rolling_per_key(ray_session):
    """LAG delta and trailing rolling max follow the (ts, id) order
    within each key; the first event of a key gets delta_us = -1."""
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.relational import lag_rolling

    df = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5],
            "user_id": [7, 7, 7, 8, 8],
            "ts": pd.to_datetime(
                [10, 25, 31, 5, 9], unit="s"
            ),
            "value": [3.0, 1.0, 2.0, 9.0, 4.0],
        }
    )
    out = (
        lag_rolling(rd.from_pandas(df).repartition(3), "user_id", "ts",
                    "value", "event_id", roll_n=2)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert out["delta_us"].tolist() == [
        -1, 15_000_000, 6_000_000, -1, 4_000_000
    ]
    assert out["roll_max"].tolist() == [3.0, 3.0, 2.0, 9.0, 9.0]


def test_ntile_by_matches_sql_ntile(ray_session):
    """The histogram-offset rank reproduces SQL NTILE bucket sizes:
    first n%k buckets get ceil(n/k) rows, ties break by id, and no
    group ever holds a whole partition."""
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.relational import ntile_by

    rng = np.random.RandomState(7)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(403),
            "lang": rng.choice(["en", "de", "fr"], 403),
            "n_tokens": rng.randint(0, 25, 403),  # heavy tie classes
        }
    )
    got = (
        ntile_by(rd.from_pandas(df).repartition(4), "lang", "n_tokens",
                 "doc_id", k=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        """SELECT doc_id, ntile(4) OVER (
               PARTITION BY lang ORDER BY n_tokens, doc_id) AS bucket
           FROM df ORDER BY doc_id"""
    ).df()
    assert got["bucket"].tolist() == want["bucket"].tolist()


def test_kmeans_fit_matches_numpy_reference(ray_session):
    """Distributed Lloyd's (partial-sum reduce) converges to the same
    centroids as a single-process numpy run with the same seed rows and
    iteration count, and the diversity sample is cluster-balanced."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.similarity import (
        kmeans_diversity_sample,
        kmeans_fit,
    )

    rng = np.random.RandomState(3)
    blobs = np.concatenate(
        [rng.normal(c, 0.05, size=(40, 8)) for c in (-1.0, 0.0, 1.0)]
    )
    df = pd.DataFrame(
        {"vec_id": np.arange(len(blobs)), "embedding": list(blobs)}
    )
    ds = rd.from_pandas(df).repartition(5)
    got = kmeans_fit(ds, k=3, iters=4, concurrency=2)

    def norm(m):
        return m / np.linalg.norm(m, axis=1, keepdims=True)

    m = norm(blobs.astype(np.float64))
    want = m[:3].copy()  # same deterministic init: 3 smallest vec_ids
    for _ in range(4):
        assign = (m @ want.T).argmax(axis=1)
        for c in range(3):
            members = m[assign == c]
            if len(members):
                v = members.sum(axis=0)
                want[c] = v / np.linalg.norm(v)
    assert np.allclose(got, want, atol=1e-9)

    sample = kmeans_diversity_sample(ds, got, m=4)
    assert len(sample) == 12
    assert sample.groupby("cluster").size().tolist() == [4, 4, 4]
    # every sampled vector really is among its cluster's 4 nearest
    sims = m @ got.T
    assign = sims.argmax(axis=1)
    best = sims[np.arange(len(m)), assign]
    for c in range(3):
        ids = np.flatnonzero(assign == c)
        nearest = ids[np.lexsort((ids, -best[ids]))][:4]
        assert set(sample[sample["cluster"] == c]["vec_id"]) == set(nearest)


def test_rollup_aggregate_levels(ray_session):
    """One-shuffle ROLLUP: detail rows, per-prefix subtotals, and the
    grand total all come out of a single groupby over fanned-out
    partials."""
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.relational import rollup_aggregate

    df = pd.DataFrame(
        {
            "a": ["x", "x", "y", "y"],
            "b": ["p", "q", "p", "p"],
            "v": [1, 2, 4, 8],
        }
    )
    out = (
        rollup_aggregate(
            rd.from_pandas(df).repartition(2), ["a", "b"],
            {"n": ("v", "count"), "s": ("v", "sum")},
        )
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {
            "a": ["ALL", "x", "x", "x", "y", "y"],
            "b": ["ALL", "ALL", "p", "q", "ALL", "p"],
            "n": [4, 2, 1, 1, 2, 2],
            "s": [15, 3, 1, 2, 12, 12],
        }
    )
    assert out[["a", "b"]].values.tolist() == want[["a", "b"]].values.tolist()
    assert out["n"].astype(int).tolist() == want["n"].tolist()
    assert out["s"].astype(int).tolist() == want["s"].tolist()


def test_bucketed_layout_join(ray_session, tmp_path):
    """Co-located bucket join equals a plain hash join, including
    layouts with empty buckets (n_buckets > distinct keys)."""
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.layout import bucketed_join, write_bucketed

    left = pd.DataFrame({"k": [1, 2, 3, 5], "a": ["w", "x", "y", "z"]})
    right = pd.DataFrame(
        {"k": [1, 1, 2, 4], "b": [10.0, 11.0, 20.0, 40.0]}
    )
    nb = 8
    write_bucketed(rd.from_pandas(left).repartition(2), "k",
                   str(tmp_path / "l"), nb)
    write_bucketed(rd.from_pandas(right).repartition(2), "k",
                   str(tmp_path / "r"), nb)
    got = (
        bucketed_join(str(tmp_path / "l"), str(tmp_path / "r"), "k", nb)
        .to_pandas()
        .sort_values(["k", "b"])
        .reset_index(drop=True)
    )
    want = (
        left.merge(right, on="k")
        .sort_values(["k", "b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["k", "a", "b"]], want[["k", "a", "b"]]
    )


def test_sharded_dedup_index_incremental(ray_session):
    """Exactly-one admission per content hash, within a run (batches
    racing across shards) and across sequential runs (day 2 dedups
    against day 1's persistent index)."""
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.stream_dedup import ShardedDedupIndex

    texts1 = [f"doc {i % 7}" for i in range(50)]  # 7 uniques, heavy dup
    texts2 = [f"doc {i % 7}" for i in range(10)] + ["fresh a", "fresh b"]
    day1 = rd.from_pandas(
        pd.DataFrame({"doc_id": range(50), "text": texts1})
    ).repartition(8)
    day2 = rd.from_pandas(
        pd.DataFrame({"doc_id": range(12), "text": texts2})
    ).repartition(4)

    index = ShardedDedupIndex(n_shards=3)
    kept1 = index.filter_new(day1).to_pandas()
    assert sorted(kept1["text"]) == sorted({f"doc {i}" for i in range(7)})
    kept2 = index.filter_new(day2).to_pandas()
    assert sorted(kept2["text"]) == ["fresh a", "fresh b"]
    assert sum(index.sizes()) == 9


def test_write_packed_shards_resume(ray_session, tmp_path):
    """Shard files land one-per-(bucket, shard) with the offset-split
    weights; a second run recomputes identical shards and skips every
    existing file; rows round-trip."""
    import pandas as pd
    import pyarrow.dataset as pds
    import ray.data as rd

    from unfurl_ray.ops.relational import write_packed_shards

    df = pd.DataFrame(
        {
            "doc_id": range(20),
            "text": [f"payload {i}" for i in range(20)],
            "w": [600] * 20,
        }
    )
    out = str(tmp_path / "shards")
    m1 = write_packed_shards(
        rd.from_pandas(df).repartition(4), "w", budget=1000,
        out_dir=out, n_buckets=2,
    )
    assert not m1["skipped"].any()
    assert (m1["weight"] >= 600).all()
    m2 = write_packed_shards(
        rd.from_pandas(df).repartition(4), "w", budget=1000,
        out_dir=out, n_buckets=2,
    )
    assert m2["skipped"].all()
    assert m1.drop(columns=["skipped"]).equals(m2.drop(columns=["skipped"]))
    back = pds.dataset(out, format="parquet").to_table().to_pandas()
    assert sorted(back["doc_id"]) == list(range(20))
    assert sorted(back["text"]) == sorted(df["text"])


def test_distinct_count_by_two_level(ray_session):
    """Grouped COUNT DISTINCT via pair collapse: duplicates within and
    across blocks count once; no per-key set materializes."""
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.relational import distinct_count_by

    df = pd.DataFrame(
        {
            "k": ["a"] * 6 + ["b"] * 3,
            "v": [1, 1, 2, 2, 3, 3, 7, 7, 7],
        }
    )
    out = (
        distinct_count_by(rd.from_pandas(df).repartition(4), "k", "v")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out["k"].tolist() == ["a", "b"]
    assert out["n_distinct"].astype(int).tolist() == [3, 1]


def test_pivot_counts_crosstab(ray_session):
    """Crosstab fan-out: per-key counts per named category, zero-filled
    for keys that never hit a category."""
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.relational import pivot_counts

    df = pd.DataFrame(
        {
            "u": [1, 1, 1, 2, 2, 3],
            "t": ["x", "x", "y", "y", "y", "x"],
        }
    )
    out = (
        pivot_counts(rd.from_pandas(df).repartition(3), "u", "t",
                     ["x", "y"])
        .to_pandas()
        .sort_values("u")
        .reset_index(drop=True)
    )
    assert out["n_x"].astype(int).tolist() == [2, 0, 1]
    assert out["n_y"].astype(int).tolist() == [1, 2, 0]


def test_range_join_overlapping_intervals(ray_session):
    """Many-to-many interval join: a value inside two overlapping
    bands lands in both; values outside every band drop (inner)."""
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.relational import range_join

    tiers = pd.DataFrame(
        {"tier": ["a", "b"], "lo": [0.0, 5.0], "hi": [10.0, 15.0]}
    )
    df = pd.DataFrame(
        {"event_id": [1, 2, 3], "value": [7.0, 12.0, 99.0]}
    )
    out = (
        range_join(rd.from_pandas(df).repartition(2), tiers, "value",
                   concurrency=2)
        .to_pandas()
        .sort_values(["event_id", "tier"])
        .reset_index(drop=True)
    )
    assert list(zip(out["event_id"], out["tier"])) == [
        (1, "a"), (1, "b"), (2, "b")
    ]


def test_grouped_hll_matches_exact_within_bound(ray_session):
    """Grouped HLL estimates track the exact grouped distinct counts
    within the p=12 sketch error (~1.6% relative, allow 5%)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.sketch import grouped_hll_distinct

    rng = np.random.RandomState(11)
    df = pd.DataFrame(
        {
            "k": rng.choice(["x", "y", "z"], 30_000),
            "v": rng.randint(0, 5_000, 30_000),
        }
    )
    got = grouped_hll_distinct(
        rd.from_pandas(df).repartition(6), "k", "v"
    )
    exact = df.groupby("k")["v"].nunique()
    for _, row in got.iterrows():
        e = exact[row["k"]]
        assert abs(row["n_distinct_est"] - e) / e < 0.05


def test_bucketed_join_left_keeps_unmatched(ray_session, tmp_path):
    """how='left' keeps left rows with typed nulls when the right side
    has no match — including buckets the right never wrote at all."""
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.layout import bucketed_join, write_bucketed

    left = pd.DataFrame({"k": [1, 2, 3, 4], "a": ["w", "x", "y", "z"]})
    right = pd.DataFrame({"k": [2], "b": [20.0]})
    nb = 8
    write_bucketed(rd.from_pandas(left).repartition(2), "k",
                   str(tmp_path / "l"), nb)
    write_bucketed(rd.from_pandas(right), "k", str(tmp_path / "r"), nb)
    got = (
        bucketed_join(str(tmp_path / "l"), str(tmp_path / "r"), "k", nb,
                      how="left")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert got["k"].tolist() == [1, 2, 3, 4]
    assert got["b"].notna().tolist() == [False, True, False, False]
    assert got.loc[1, "b"] == 20.0


def test_skew_join_matches_plain_join(ray_session):
    """Hybrid hot-broadcast/cold-shuffle join returns exactly the
    plain inner join's rows, with hot keys (freq >= threshold) taking
    the broadcast path."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.skew import skew_join

    rng = np.random.RandomState(5)
    left = pd.DataFrame(
        {
            # key 7 is Zipf-hot (60 rows); the rest have 1-3
            "k": np.concatenate([[7] * 60, rng.randint(0, 7, 30)]),
            "v": np.arange(90),
        }
    )
    right = pd.DataFrame({"rk": np.arange(8), "label": list("abcdefgh")})
    got = (
        skew_join(
            rd.from_pandas(left).repartition(4),
            rd.from_pandas(right).repartition(2),
            on="k", right_on="rk", hot_threshold=10, concurrency=2,
        )
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    want = (
        left.merge(right, left_on="k", right_on="rk")
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    assert got["v"].tolist() == want["v"].tolist()
    assert got["label"].tolist() == want["label"].tolist()


def test_bucketed_aggregate_matches_pre_aggregate(ray_session):
    """High-cardinality aggregate via hash-bucket merge: same results
    as a pandas groupby over min/max/sum/count."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.relational import bucketed_aggregate

    rng = np.random.RandomState(9)
    df = pd.DataFrame(
        {"k": rng.randint(0, 5000, 20_000), "v": rng.randint(0, 100, 20_000)}
    )
    got = (
        bucketed_aggregate(
            rd.from_pandas(df).repartition(6), ["k"],
            {"n": ("v", "count"), "s": ("v", "sum"),
             "lo": ("v", "min"), "hi": ("v", "max")},
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        df.groupby("k", as_index=False)
        .agg(n=("v", "count"), s=("v", "sum"), lo=("v", "min"),
             hi=("v", "max"))
        .sort_values("k")
        .reset_index(drop=True)
    )
    for c in ["k", "n", "s", "lo", "hi"]:
        assert got[c].astype("int64").tolist() == want[c].tolist()


def test_rolling_range_window_matches_pandas(ray_session):
    """RANGE-frame rolling count/sum over [t-W, t] matches a
    single-partition pandas reference, including ts ties (peers are
    all included, per SQL RANGE semantics)."""
    import ray.data as rd

    from unfurl_ray.ops.relational import rolling_range_window

    rng = np.random.default_rng(11)
    n = 3000
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 20, n),
            "ts": pd.to_datetime(
                rng.integers(0, 36_000, n), unit="s"
            ),
            "value": rng.normal(10, 5, n).round(3),
        }
    )
    out = (
        rolling_range_window(
            rd.from_pandas(df).repartition(8), "user_id", "ts",
            "value", "event_id", width_s=300, n_shards=16,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert len(out) == n

    ts_us = df["ts"].astype("int64") // 1000
    cents = np.floor(df["value"].to_numpy() * 100.0).astype(np.int64)
    ref = df.assign(_t=ts_us, _c=cents)
    w = 300 * 1_000_000
    exp_cnt, exp_sum = {}, {}
    for _, g in ref.groupby("user_id"):
        g = g.sort_values("_t")
        t = g["_t"].to_numpy()
        c = g["_c"].to_numpy()
        csum = np.concatenate([[0], np.cumsum(c)])
        lo = np.searchsorted(t, t - w, side="left")
        hi = np.searchsorted(t, t, side="right")
        for eid, a, b in zip(g["event_id"], lo, hi):
            exp_cnt[eid] = b - a
            exp_sum[eid] = csum[b] - csum[a]
    assert out["cnt_w"].tolist() == [exp_cnt[e] for e in out["event_id"]]
    assert out["sum_cents_w"].tolist() == [
        exp_sum[e] for e in out["event_id"]
    ]


def test_rolling_range_window_hot_key(ray_session):
    """Skew drill: ONE key holds 50k events across 16 blocks; the
    (key, time-bucket) decomposition must still be exact, and no
    group depends on the key's total stream length."""
    import ray.data as rd

    from unfurl_ray.ops.relational import rolling_range_window

    rng = np.random.default_rng(5)
    n = 50_000
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": np.zeros(n, dtype=np.int64),
            "ts": pd.to_datetime(np.sort(rng.integers(0, 100_000, n)),
                                 unit="s"),
            "value": np.ones(n),
        }
    )
    out = (
        rolling_range_window(
            rd.from_pandas(df.sample(frac=1.0, random_state=2))
            .repartition(16),
            "user_id", "ts", "value", "event_id",
            width_s=600, n_shards=64,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert len(out) == n
    # count == sum of 100-cent rows / 100 everywhere (value is 1.0)
    assert (out["sum_cents_w"] == out["cnt_w"] * 100).all()
    # exact spot-check against a brute interval count on the sorted ts
    t = (df["ts"].astype("int64") // 1000).to_numpy()
    w = 600 * 1_000_000
    lo = np.searchsorted(t, t - w, side="left")
    hi = np.searchsorted(t, t, side="right")
    exp = (hi - lo).astype(np.int64)
    got = out.set_index("event_id")["cnt_w"]
    assert (got.loc[df["event_id"]].to_numpy() == exp).all()


def test_duplicate_ngram_spans(ray_session):
    """Docs sharing a 5-token window are flagged with the exact count
    of duplicated positions; within-doc repeats count too; unique
    docs are absent from the output."""
    import ray.data as rd

    from unfurl_ray.ops.dedup import duplicate_ngram_spans

    boiler = "the quick brown fox jumps"
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                f"{boiler} over the lazy dog",      # shares gram w/ 2
                f"intro words here {boiler}",        # shares gram w/ 1
                f"{boiler} and {boiler} again ok",   # self-repeat
                "totally unique text with no overlap at all",
            ],
        }
    )
    out = (
        duplicate_ngram_spans(
            rd.from_pandas(df).repartition(3), n=5, n_buckets=8
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # doc 4 has no duplicated grams -> absent
    assert out["doc_id"].tolist() == [1, 2, 3]
    # doc 1: only the boiler gram at position 0 duplicates
    assert out.loc[0, "n_dup_grams"] == 1
    # doc 2: boiler gram at the tail duplicates
    assert out.loc[1, "n_dup_grams"] == 1
    # doc 3: both copies of the boiler gram count
    assert out.loc[2, "n_dup_grams"] == 2


def test_chunk_by_tokens(ray_session):
    """Sliding-window chunking: full windows every stride, short tail
    kept, empty docs emit nothing, every token covered >= once."""
    import ray.data as rd

    from unfurl_ray.ops.chunk import chunk_by_tokens

    toks = [f"t{i}" for i in range(10)]
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [" ".join(toks), "only three  tokens", "  "],
        }
    )
    out = (
        chunk_by_tokens(
            rd.from_pandas(df).repartition(2),
            text_col="text", id_col="doc_id", window=4, stride=3,
        )
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    # doc 1: starts 0,3,6,9 -> windows of 4,4,4 and tail of 1
    d1 = out[out["doc_id"] == 1]
    assert d1["chunk_id"].tolist() == [0, 1, 2, 3]
    assert d1["n_tokens"].tolist() == [4, 4, 4, 1]
    assert d1["chunk_text"].iloc[0] == "t0 t1 t2 t3"
    assert d1["chunk_text"].iloc[1] == "t3 t4 t5 t6"  # overlap of 1
    assert d1["chunk_text"].iloc[3] == "t9"
    # doc 2: one short chunk; double space collapses
    d2 = out[out["doc_id"] == 2]
    assert d2["chunk_text"].tolist() == ["only three tokens"]
    # doc 3 (whitespace only) absent entirely
    assert 3 not in out["doc_id"].tolist()


def test_weighted_sample_per_group(ray_session):
    """A-ES: selection is deterministic, k per group, and heavily
    weighted rows dominate the sample."""
    import ray.data as rd

    from unfurl_ray.ops.sampling import weighted_sample_per_group

    # group 'a': ids 0..99, one id (7) with 1000x the weight of the rest
    df = pd.DataFrame(
        {
            "grp": ["a"] * 100 + ["b"] * 10,
            "rid": list(range(100)) + list(range(100, 110)),
            "w": [1000.0 if i == 7 else 1.0 for i in range(100)]
            + [1.0] * 10,
        }
    )
    out = weighted_sample_per_group(
        rd.from_pandas(df).repartition(4),
        key_col="grp", id_col="rid", weight_col="w", k=3,
    )
    assert (out.groupby("grp").size() == 3).all()
    # the 1000x row is essentially always in a 3-of-100 sample
    assert 7 in out[out["grp"] == "a"]["rid"].tolist()
    # determinism across block layouts
    out2 = weighted_sample_per_group(
        rd.from_pandas(df).repartition(9),
        key_col="grp", id_col="rid", weight_col="w", k=3,
    )
    assert sorted(out["rid"]) == sorted(out2["rid"])


def test_mixture_sample_quotas(ray_session):
    """Exact per-domain quotas, unlisted domains excluded, md5-rank
    selection stable across block layouts."""
    import ray.data as rd

    from unfurl_ray.ops.sampling import mixture_sample

    df = pd.DataFrame(
        {
            "src": ["x"] * 50 + ["y"] * 50 + ["z"] * 50,
            "rid": range(150),
        }
    )
    out = mixture_sample(
        rd.from_pandas(df).repartition(5),
        key_col="src", id_col="rid",
        target_weights={"x": 0.75, "y": 0.25}, total=20,
    )
    counts = out.groupby("src").size()
    assert counts.to_dict() == {"x": 15, "y": 5}
    out2 = mixture_sample(
        rd.from_pandas(df).repartition(11),
        key_col="src", id_col="rid",
        target_weights={"x": 0.75, "y": 0.25}, total=20,
    )
    assert sorted(out["rid"]) == sorted(out2["rid"])


def test_quarantine_map_isolation(ray_session):
    """Raising rows are isolated via bisection (not whole-batch loss),
    clean rows match a plain map, all-error batches keep the schema."""
    import ray.data as rd

    from unfurl_ray.ops.robust import quarantine_map

    df = pd.DataFrame({"rid": range(20), "v": range(20)})

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        # raises on v % 7 == 3 (rows 3, 10, 17)
        out["inv"] = [1 if v % 7 != 3 else 1 // 0 for v in out["v"]]
        return out

    out = (
        quarantine_map(
            rd.from_pandas(df).repartition(3), fn, id_cols=["rid"],
            out_schema={"rid": "int64", "v": "Int64", "inv": "Int64"},
        )
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    assert len(out) == 20
    bad = out[out["status"] == "error"]
    assert bad["rid"].tolist() == [3, 10, 17]
    assert (bad["error"] == "ZeroDivisionError").all()
    assert bad["inv"].isna().all()
    ok = out[out["status"] == "ok"]
    assert (ok["inv"] == 1).all() and (ok["error"] == "").all()
    # an all-error partition still emits the contracted schema
    all_bad = pd.DataFrame({"rid": [100, 101], "v": [3, 10]})
    out2 = quarantine_map(
        rd.from_pandas(all_bad), fn, id_cols=["rid"],
        out_schema={"rid": "int64", "v": "Int64", "inv": "Int64"},
    ).to_pandas()
    assert list(out2.columns) == ["rid", "v", "inv", "status", "error"]
    assert (out2["status"] == "error").all()


def test_resample_locf_semantics(ray_session, tmp_path):
    """Grid points before a user's first event are null; values carry
    forward across empty buckets; exact-ts grid points include the
    event (backward <= semantics)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from unfurl_ray.pipelines import q_resample_locf

    ts = pd.to_datetime(
        ["2024-01-01 05:00:00", "2024-01-03 01:00:00",
         "2024-01-01 00:00:00"]
    )
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 2],
            "ts": ts,
            "value": [10.0, 20.0, 5.0],
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    out = q_resample_locf(str(tmp_path))
    # grid: 2024-01-01 00:00 .. 2024-01-03 00:00 every 6 h = 9 points
    assert out["gsec"].nunique() == 9
    u1 = out[out["user_id"] == 1].reset_index(drop=True)
    # first event at 05:00 -> grid 00:00 null, 06:00.. carries 10.0
    assert pd.isna(u1["value"].iloc[0])
    assert u1["value"].iloc[1] == 10.0
    assert u1["value"].iloc[8] == 10.0  # 2024-01-03 00:00 < 01:00
    u2 = out[out["user_id"] == 2].reset_index(drop=True)
    # event exactly ON the first grid point is included (<=)
    assert (u2["value"] == 5.0).all()


def test_percent_rank_by(ray_session):
    """Histogram percent_rank matches pandas rank(method='min') math,
    handles ties and single-row groups."""
    import ray.data as rd

    from unfurl_ray.ops.relational import percent_rank_by

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "k": ["a"] * 500 + ["b"] * 10 + ["c"],  # heavy skew on 'a'
            "v": np.concatenate(
                [rng.integers(0, 20, 500),  # many ties
                 rng.integers(0, 5, 10), [3]]
            ).astype("float64"),
            "rid": range(511),
        }
    )
    out = (
        percent_rank_by(
            rd.from_pandas(df).repartition(4), key_col="k", value_col="v"
        )
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    exp = (
        df.groupby("k")["v"]
        .transform(lambda s: (s.rank(method="min") - 1)
                   / max(len(s) - 1, 1))
        .round(6)
    )
    assert np.allclose(out["pr"].to_numpy(), exp.to_numpy())
    # single-row group -> 0
    assert out.loc[out["k"] == "c", "pr"].iloc[0] == 0.0


def test_k_anonymize(ray_session):
    """Rare tuples suppressed to '*', frequent ones untouched, and the
    released table is k-anonymous by construction."""
    import ray.data as rd

    from unfurl_ray.ops.privacy import k_anonymize

    df = pd.DataFrame(
        {
            "rid": range(10),
            "a": ["x"] * 6 + ["y"] * 3 + ["z"],
            "b": ["p"] * 6 + ["q"] * 3 + ["r"],
        }
    )
    out = (
        k_anonymize(
            rd.from_pandas(df).repartition(3), ["a", "b"], k=3
        )
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    assert (out.loc[out["rid"] < 9, "a"] != "*").all()
    assert out.loc[9, "a"] == "*" and out.loc[9, "b"] == "*"
    assert out.loc[9, "group_n"] == 1
    # every released tuple (ignoring the sentinel class) appears >= k
    released = out[out["a"] != "*"].groupby(["a", "b"]).size()
    assert (released >= 3).all()


def test_write_jsonl_shards_resume(ray_session, tmp_path):
    """Files are valid JSONL sorted by id; a second run skips all
    existing parts; content round-trips."""
    import json as _json

    import ray.data as rd

    from unfurl_ray.ops.layout import write_jsonl_shards

    df = pd.DataFrame(
        {"doc_id": range(40), "txt": [f"d{i}" for i in range(40)]}
    )
    out = str(tmp_path / "jsonl")
    m1 = write_jsonl_shards(
        rd.from_pandas(df).repartition(4), out, id_col="doc_id",
        n_buckets=4,
    )
    assert m1["n_rows"].sum() == 40 and not m1["skipped"].any()
    # every line is JSON; ids ascend within a file
    import glob

    total = 0
    for f in sorted(glob.glob(out + "/part-*.jsonl")):
        ids = [_json.loads(ln)["doc_id"] for ln in open(f)]
        assert ids == sorted(ids)
        total += len(ids)
    assert total == 40
    # resume: all parts skipped, manifest identical counts
    m2 = write_jsonl_shards(
        rd.from_pandas(df).repartition(7), out, id_col="doc_id",
        n_buckets=4,
    )
    assert m2["skipped"].all()
    assert m2["n_rows"].tolist() == m1["n_rows"].tolist()


def test_funnel_counts_ordering(ray_session):
    """Only strictly-after events count; first-touch anchors."""
    import ray.data as rd

    from unfurl_ray.ops.relational import funnel_counts

    ts = pd.to_datetime(
        [
            "2024-01-01 00:00", "2024-01-01 01:00", "2024-01-01 02:00",
            # u2: B before A -> not converted past step A
            "2024-01-02 00:00", "2024-01-01 23:00",
            # u3: A only
            "2024-01-03 00:00",
        ]
    )
    df = pd.DataFrame(
        {
            "u": [1, 1, 1, 2, 2, 3],
            "ts": ts,
            "t": ["A", "B", "C", "A", "B", "A"],
        }
    )
    out = funnel_counts(
        rd.from_pandas(df).repartition(3), key_col="u", ts_col="ts",
        type_col="t", steps=["A", "B", "C"],
    )
    assert out["n_users"].tolist() == [3, 1, 1]


def test_zscore_by(ray_session):
    """Matches per-group population z-scores; constant group -> NaN."""
    import ray.data as rd

    from unfurl_ray.ops.relational import zscore_by

    df = pd.DataFrame(
        {
            "k": ["a"] * 4 + ["b"] * 3,
            "v": [1.0, 2.0, 3.0, 4.0, 5.0, 5.0, 5.0],
            "rid": range(7),
        }
    )
    out = (
        zscore_by(rd.from_pandas(df).repartition(3), "k", "v")
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    exp_a = (df[df.k == "a"].v - 2.5) / np.std([1, 2, 3, 4])
    assert np.allclose(out.loc[:3, "z"], np.round(exp_a, 6))
    assert out.loc[4:, "z"].isna().all()  # zero variance


def test_dataset_diff(ray_session):
    """added / removed / changed classified; unchanged dropped."""
    import ray.data as rd

    from unfurl_ray.ops.diff import dataset_diff

    old = pd.DataFrame({"doc_id": [1, 2, 3], "fp": ["x", "y", "z"]})
    new = pd.DataFrame({"doc_id": [2, 3, 4], "fp": ["y", "Z2", "w"]})
    out = (
        dataset_diff(
            rd.from_pandas(old), rd.from_pandas(new),
            id_col="doc_id", fp_col="fp",
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.to_dict("records") == [
        {"doc_id": 1, "status": "removed"},
        {"doc_id": 3, "status": "changed"},
        {"doc_id": 4, "status": "added"},
    ]


def test_windowed_pair_join(ray_session):
    """Pairs across bucket boundaries found once; (0, W] bounds are
    strict-exclusive / inclusive; other keys never match."""
    import ray.data as rd

    from unfurl_ray.ops.relational import windowed_pair_join

    base = pd.Timestamp("2024-01-01")
    rows = [
        # u1: view at t=0; clicks at +1s (in), +3600s (boundary, in),
        # +3601s (out), -5s (before, out)
        (1, 1, base, "view"),
        (2, 1, base + pd.Timedelta(seconds=1), "click"),
        (3, 1, base + pd.Timedelta(seconds=3600), "click"),
        (4, 1, base + pd.Timedelta(seconds=3601), "click"),
        (5, 1, base - pd.Timedelta(seconds=5), "click"),
        # u2 click inside u1's window: different key, no match
        (6, 2, base + pd.Timedelta(seconds=10), "click"),
        # u1 second view late in a bucket, click early in the next one
        (7, 1, base + pd.Timedelta(seconds=3599), "view"),
        (8, 1, base + pd.Timedelta(seconds=3650), "click"),
    ]
    df = pd.DataFrame(
        rows, columns=["event_id", "user_id", "ts", "event_type"]
    )
    out = (
        windowed_pair_join(
            rd.from_pandas(df).repartition(3),
            key_col="user_id", ts_col="ts", id_col="event_id",
            type_col="event_type", left_type="view",
            right_type="click", width_s=3600, n_merge_buckets=8,
        )
        .to_pandas()
        .sort_values(["left_id", "right_id"])
        .reset_index(drop=True)
    )
    got = list(map(tuple, out.to_numpy()))
    assert got == [(1, 2), (1, 3), (7, 3), (7, 4), (7, 8)]


def test_mad_outliers_by(ray_session):
    """Median/MAD in integer cents with quantile_disc (lower-median)
    semantics; outliers counted strictly beyond z*MAD; a key whose
    rows span many blocks never groups raw rows."""
    import ray.data as rd

    from unfurl_ray.ops.relational import mad_outliers_by

    # key 'a': values 1..9 plus a wild 100 -> med of floor-cents
    # [100..900, 10000] (n=10, lower median = 500), MAD hist of
    # |c-500|: [400,300,200,100,0,100,200,300,400,9500] -> sorted
    # lower-median = 200; outliers: |c-500| > 600 -> only 10000.
    rows = [("a", float(v)) for v in range(1, 10)] + [("a", 100.0)]
    # key 'b': constant -> mad 0, every deviation 0, no outliers
    rows += [("b", 2.5)] * 5
    df = pd.DataFrame(rows, columns=["k", "v"])
    out = (
        mad_outliers_by(
            rd.from_pandas(df).repartition(4), key_col="k",
            value_col="v", z=3.0,
        )
        .sort_values("k")
        .reset_index(drop=True)
    )
    a = out[out["k"] == "a"].iloc[0]
    assert (a["median"], a["mad"], a["n"], a["n_outliers"]) == (
        5.0, 2.0, 10, 1
    )
    b = out[out["k"] == "b"].iloc[0]
    assert (b["median"], b["mad"], b["n"], b["n_outliers"]) == (
        2.5, 0.0, 5, 0
    )


def test_cdc_apply_changes(ray_session):
    """Highest version wins per key; deletes drop the key; inserts
    appear; same-version duplicates resolve to the last-sorting
    payload; keys split across blocks still merge once."""
    import ray.data as rd

    from unfurl_ray.ops.cdc import apply_changes

    base = pd.DataFrame(
        {"k": [1, 2, 3, 4], "v": ["a", "b", "c", "d"]}
    )
    changes = pd.DataFrame(
        {
            "k": [2, 2, 3, 5, 5],
            "v": ["b1", "b2", "", "e1", "e2"],
            "op": ["upsert", "upsert", "delete", "upsert", "upsert"],
            "ver": [1, 2, 1, 1, 1],
        }
    )
    out = (
        apply_changes(
            rd.from_pandas(base).repartition(3),
            rd.from_pandas(changes).repartition(2),
            key_col="k", payload_cols=["v"], n_buckets=4,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert list(map(tuple, out.to_numpy())) == [
        (1, "a"),      # untouched
        (2, "b2"),     # ver 2 beats ver 1
        (4, "d"),      # untouched (3 deleted)
        (5, "e2"),     # insert; same-ver tie -> last-sorting payload
    ]


def test_update_aggregate_incremental(ray_session):
    """Incremental refresh equals from-scratch recompute; non-additive
    aggregates are refused."""
    import pytest
    import ray.data as rd

    from unfurl_ray.ops.incremental import update_aggregate
    from unfurl_ray.ops.relational import pre_aggregate

    base = pd.DataFrame(
        {"k": ["a", "a", "b"], "v": [1.0, 2.0, 3.0]}
    )
    delta = pd.DataFrame(
        {"k": ["a", "b", "c"], "v": [4.0, 5.0, 6.0]}
    )
    snap = pre_aggregate(
        rd.from_pandas(base).repartition(2), ["k"],
        {"n": ("v", "count"), "s": ("v", "sum")},
    )
    out = (
        update_aggregate(
            snap, rd.from_pandas(delta).repartition(2), ["k"],
            {"n": ("v", "count"), "s": ("v", "sum")}, n_buckets=4,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert list(map(tuple, out[["k", "n", "s"]].to_numpy())) == [
        ("a", 3, 7.0), ("b", 2, 8.0), ("c", 1, 6.0)
    ]
    with pytest.raises(ValueError, match="additive"):
        update_aggregate(snap, snap, ["k"], {"m": ("v", "max")})


def test_zorder_key_interleaves_bits():
    """Morton code interleaves a into even bits and b into odd bits."""
    import numpy as np

    from unfurl_ray.ops.layout import zorder_key

    a = np.array([0b101, 0, 0xFFFF], dtype=np.uint64)
    b = np.array([0b011, 1, 0], dtype=np.uint64)
    z = zorder_key(a, b)
    assert z[0] == 0b011011  # (a=101, b=011) -> b1 a1 b0 a0 pairs
    assert z[1] == 0b10
    assert z[2] == 0x55555555


def test_zorder_box_read_matches_brute_filter(ray_session, tmp_path):
    """write_zordered + read_zordered_box returns exactly the box rows
    (pruning overshoot removed) while reading fewer cells than exist,
    including bounds clipped outside the data range."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.layout import read_zordered_box, write_zordered

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "x": rng.integers(0, 1000, 5000).astype(np.int64),
            "y": rng.integers(0, 200, 5000).astype(np.int64),
            "v": rng.standard_normal(5000),
        }
    )
    path = str(tmp_path / "z")
    write_zordered(
        rd.from_pandas(df).repartition(4), "x", "y", path, cell_bits=6
    )
    boxed, n_read, n_total = read_zordered_box(
        path, 100, 299, 50, 2000, columns=["x", "y", "v"]
    )
    got = boxed.to_pandas().sort_values(["x", "y", "v"]).reset_index(
        drop=True
    )
    want = (
        df[(df.x >= 100) & (df.x <= 299) & (df.y >= 50)]
        .sort_values(["x", "y", "v"])
        .reset_index(drop=True)[["x", "y", "v"]]
    )
    pd.testing.assert_frame_equal(got, want)
    assert 0 < n_read < n_total


def test_running_total_skewed_key(ray_session):
    """Distributed prefix sum matches a pandas cumsum even when one
    key holds most of the stream (no one-key-per-group assumption:
    the hot key spans many (key, bucket) cells)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.relational import running_total

    rng = np.random.default_rng(3)
    n_hot, n_cold = 8000, 2000
    df = pd.DataFrame(
        {
            "id": np.arange(n_hot + n_cold, dtype=np.int64),
            "k": np.concatenate(
                [
                    np.zeros(n_hot, dtype=np.int64),
                    rng.integers(1, 50, n_cold),
                ]
            ),
            "ts": pd.to_datetime(
                rng.integers(0, 10 * 86_400_000_000, n_hot + n_cold),
                unit="us",
            ),
            "v": rng.uniform(-5, 5, n_hot + n_cold),
        }
    )
    got = (
        running_total(
            rd.from_pandas(df).repartition(8), key_col="k",
            ts_col="ts", value_col="v", id_col="id",
            bucket_s=86_400, n_shards=16,
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    ref = df.copy()
    ref["cents"] = np.floor(ref.v * 100).astype(np.int64)
    ref = ref.sort_values(["k", "ts", "id"])
    ref["cum_n"] = ref.groupby("k").cumcount() + 1
    ref["cum_cents"] = ref.groupby("k")["cents"].cumsum()
    ref = ref.sort_values("id").reset_index(drop=True)
    assert (got["id"].to_numpy() == ref["id"].to_numpy()).all()
    assert (got["cum_n"].to_numpy() == ref["cum_n"].to_numpy()).all()
    assert (
        got["cum_cents"].to_numpy() == ref["cum_cents"].to_numpy()
    ).all()


def test_bpe_fit_matches_reference(ray_session):
    """Distributed BPE learns the exact merge sequence (pairs, counts
    and tie-breaks) of the single-process Sennrich reference,
    including multi-char merges and the aaa overlap case."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.bpe import bpe_fit, bpe_fit_reference

    rng = np.random.default_rng(11)
    vocab = ["low", "lower", "lowest", "newer", "wider", "new",
             "aaa", "aaaa", "banana", "bandana"]
    texts = [
        " ".join(rng.choice(vocab, rng.integers(3, 30)))
        for _ in range(200)
    ]
    ds = rd.from_pandas(
        pd.DataFrame({"text": texts})
    ).repartition(4).materialize()
    got = bpe_fit(ds, "text", n_merges=15, n_buckets=8)
    want = bpe_fit_reference(texts, 15)
    pd.testing.assert_frame_equal(got, want)
    # the shuffle-based fold (the over-cap scale path) must pick the
    # identical sequence as the driver fold
    bucketed = bpe_fit(
        ds, "text", n_merges=15, n_buckets=8, driver_fold_rows=0
    )
    pd.testing.assert_frame_equal(bucketed, want)


def test_compact_layout_crash_resume(ray_session, tmp_path):
    """Compaction commit protocol: a partition where a previous run
    crashed AFTER the compact-file rename but BEFORE deleting the
    originals must finish the deletion and not double-count rows."""
    import glob

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from unfurl_ray.ops.layout import compact_layout, write_bucketed

    df = pd.DataFrame(
        {
            "k": np.arange(400, dtype=np.int64),
            "v": np.arange(400, dtype=np.int64) * 2,
        }
    )
    path = str(tmp_path / "lay")
    write_bucketed(rd.from_pandas(df).repartition(8), "k", path,
                   n_buckets=4)
    # simulate the crash in one partition: compact file committed,
    # originals still present
    d0 = sorted(glob.glob(path + "/bucket=*"))[0]
    originals = sorted(glob.glob(d0 + "/*.parquet"))
    full = pa.concat_tables([pq.read_table(f) for f in originals])
    pq.write_table(full, d0 + "/compact-00000-of-00001.parquet")
    # and in ANOTHER partition a crash mid-pieces: only piece 0 of a
    # declared 2-piece set exists -> must be discarded and recompacted
    d1 = sorted(glob.glob(path + "/bucket=*"))[1]
    pq.write_table(
        pq.read_table(sorted(glob.glob(d1 + "/*.parquet"))[0]),
        d1 + "/compact-00000-of-00002.parquet",
    )

    man = compact_layout(path, target_bytes=1 << 30)
    assert man["n_rows"].sum() == 400
    assert (man["files_after"] == 1).all()
    # every partition now holds exactly its compacted file
    for d in glob.glob(path + "/bucket=*"):
        files = glob.glob(d + "/*.parquet")
        assert len(files) == 1
    # rows survived exactly once
    import pyarrow.dataset as pds
    got = pds.dataset(path, format="parquet",
                      partitioning="hive").to_table().to_pandas()
    assert sorted(got["k"].tolist()) == df["k"].tolist()


def test_ewma_matches_recurrence(ray_session):
    """The weighted-prefix-sum EWMA equals the direct per-row
    recurrence s_i = v_i + exp(-dt/tau) * s_{i-1}, including a hot
    key spanning many (key, bucket) cells."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.relational import ewma_by

    rng = np.random.default_rng(5)
    n = 6000
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "k": np.where(
                np.arange(n) % 4 == 0, 7, rng.integers(0, 6, n)
            ).astype(np.int64),
            "ts": pd.to_datetime(
                np.sort(rng.integers(0, 20 * 86_400_000_000, n)),
                unit="us",
            ),
            "v": rng.uniform(0, 10, n),
        }
    )
    tau = 2 * 86_400
    got = (
        ewma_by(
            rd.from_pandas(df).repartition(6), key_col="k",
            ts_col="ts", value_col="v", id_col="id",
            tau_s=tau, bucket_s=86_400, n_shards=16,
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    want = []
    for _k, g in df.sort_values(["k", "ts", "id"]).groupby("k"):
        s = 0.0
        prev = None
        for _, r in g.iterrows():
            t = r["ts"].value // 1000
            s = r["v"] + (
                s * np.exp(-(t - prev) / (tau * 1e6))
                if prev is not None else 0.0
            )
            prev = t
            want.append((r["id"], s))
    ref = (
        pd.DataFrame(want, columns=["id", "ewma"])
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert np.allclose(
        got["ewma"].to_numpy(), ref["ewma"].to_numpy(),
        rtol=1e-9, atol=1e-6,
    )


def test_bpe_encode_matches_scalar_apply(ray_session):
    """Distributed BPE encode equals the scalar leftmost-greedy
    Sennrich apply per word, including overlapping merges (aaa with
    merge (a,a)), chained merges, and empty/whitespace-only docs."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.bpe import END, bpe_encode_counts

    merges = pd.DataFrame(
        {
            "left": ["a", "aa", "t", "th", "e"],
            "right": ["a", "a", "h", "e", END],
        }
    )
    rng = np.random.default_rng(23)
    alphabet = list("athe")
    words = [
        "".join(rng.choice(alphabet, size=rng.integers(1, 9)))
        for _ in range(300)
    ]
    docs = [
        " ".join(rng.choice(words, size=rng.integers(0, 12)))
        for _ in range(120)
    ] + ["", "   "]
    df = pd.DataFrame(
        {
            "doc_id": np.arange(len(docs), dtype=np.int64),
            "text": docs,
        }
    )
    got = (
        bpe_encode_counts(
            rd.from_pandas(df).repartition(5), "text", "doc_id",
            merges,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    def encode_len(word):
        syms = list(word) + [END]
        for a, b in zip(merges["left"], merges["right"]):
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == a
                    and syms[i + 1] == b
                ):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    for _, r in got.iterrows():
        ws = docs[int(r["doc_id"])].lower().split()
        assert r["n_words"] == len(ws)
        assert r["n_tokens"] == sum(encode_len(w) for w in ws)


def test_triangle_count_matches_brute(ray_session):
    """Degree-oriented distributed triangle count equals the brute
    adjacency-matrix trace on random graphs, including one with a hub
    node (where orientation keeps the wedge fan-out bounded)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.graph import triangle_count

    rng = np.random.default_rng(17)
    n = 60
    A = (rng.uniform(size=(n, n)) < 0.12).astype(np.int64)
    A[0, :] = A[:, 0] = 1  # hub
    A = np.triu(A, 1)
    A = A + A.T
    iu = np.column_stack(np.nonzero(np.triu(A, 1)))
    edges = pd.DataFrame(
        {"a": iu[:, 0].astype(np.int64), "b": iu[:, 1].astype(np.int64)}
    )
    got = triangle_count(
        rd.from_pandas(edges).repartition(5), n_buckets=8
    )
    want = int(np.trace(A @ A @ A) // 6)
    assert got == want


def test_bucketed_hash_join_outer_left(ray_session):
    """Outer/left variants null-pad unmatched keys with typed Arrow
    nulls inside the same single-shuffle bucket merge, matching
    pandas' reference join on every key — including buckets that see
    only one side."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.relational import bucketed_hash_join

    rng = np.random.default_rng(3)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 50, 300).astype(np.int64),
            "lv": rng.integers(0, 1000, 300).astype(np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "k2": (rng.integers(0, 50, 200) + 25).astype(np.int64),
            "rv": rng.integers(0, 1000, 200).astype(np.int64),
        }
    )
    for how in ("outer", "left"):
        got = (
            bucketed_hash_join(
                rd.from_pandas(left).repartition(5),
                rd.from_pandas(right).repartition(4),
                on="k", right_on="k2", n_buckets=8, how=how,
            )
            .to_pandas()
            .sort_values(["k", "lv", "rv"])
            .reset_index(drop=True)
        )
        ref = (
            left.merge(
                right.rename(columns={"k2": "k"}), on="k", how=how
            )
            .sort_values(["k", "lv", "rv"])
            .reset_index(drop=True)
        )
        assert len(got) == len(ref), how
        for c in ("k", "lv", "rv"):
            pd.testing.assert_series_equal(
                got[c].astype("float64"), ref[c].astype("float64"),
                check_names=False,
            )

    # int64 fidelity above 2^53: a float round-trip anywhere on the
    # outer path would corrupt these (9007199254740993 -> ...992)
    big = np.int64(2**53 + 1)
    left_b = pd.DataFrame(
        {"k": np.array([1, 2], dtype=np.int64),
         "lv": np.array([big, big + 2], dtype=np.int64)}
    )
    right_b = pd.DataFrame(
        {"k2": np.array([2, 3], dtype=np.int64),
         "rv": np.array([big + 4, big + 6], dtype=np.int64)}
    )
    rows = bucketed_hash_join(
        rd.from_pandas(left_b), rd.from_pandas(right_b),
        on="k", right_on="k2", n_buckets=4, how="outer",
    ).take_all()  # row dicts keep Arrow int64 exact (pandas would
    by_k = {r["k"]: r for r in rows}  # re-promote nulls to float64)
    assert by_k[1]["lv"] == int(big) and by_k[1]["rv"] is None
    assert by_k[2]["lv"] == int(big + 2)
    assert by_k[2]["rv"] == int(big + 4)
    assert by_k[3]["rv"] == int(big + 6) and by_k[3]["lv"] is None


def test_merge_intervals_matches_sweep(ray_session):
    """Distributed interval union equals the single-process sweep,
    including a hot key spread over many batches, touching intervals
    (coalesce), exact duplicates, and fully-nested intervals."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.relational import merge_intervals

    rng = np.random.default_rng(13)
    n = 8000
    k = np.where(
        np.arange(n) % 3 == 0, 99, rng.integers(0, 40, n)
    ).astype(np.int64)
    s = rng.integers(0, 1_000_000, n)
    ln = rng.integers(0, 3_000, n)  # zero-length intervals included
    df = pd.DataFrame({"k": k, "s": s, "e": s + ln})
    # touching pair + duplicate + nested, deterministic
    df.loc[0, ["k", "s", "e"]] = [7, 0, 10]
    df.loc[1, ["k", "s", "e"]] = [7, 10, 20]  # touches -> coalesce
    df.loc[2, ["k", "s", "e"]] = [7, 0, 10]   # duplicate
    df.loc[3, ["k", "s", "e"]] = [7, 2, 5]    # nested

    got = (
        merge_intervals(
            rd.from_pandas(df).repartition(7), "k", "s", "e"
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )

    rows = []
    for key, g in df.sort_values(["s", "e"]).groupby("k"):
        covered = islands = 0
        run_s = run_e = None
        for _, r in g.iterrows():
            if run_e is not None and r["s"] <= run_e:
                run_e = max(run_e, r["e"])
            else:
                if run_e is not None:
                    covered += run_e - run_s
                islands += 1
                run_s, run_e = r["s"], r["e"]
        covered += run_e - run_s
        rows.append((key, islands, covered))
    ref = (
        pd.DataFrame(rows, columns=["k", "n_islands", "covered_us"])
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype("int64"), ref.astype("int64")
    )


def test_ewma_long_span_anchored_path(ray_session):
    """Keys spanning far past 700*tau reroute to the bucket-anchored
    carry path and still match the per-row recurrence exactly; mixed
    with a short-span key so the union of both paths is covered.
    Also a regression for the segmented-cumsum cancellation bug: a
    cell holding e^{~80}-scale weights must not absorb the next
    cell's small values (a global cumsum + start-offset subtraction
    silently zeroed them)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.relational import ewma_by

    rng = np.random.default_rng(7)
    n = 5000
    tau = 10.0  # seconds; long key spans 3000*tau
    ts_long = np.sort(rng.uniform(0, 3000 * tau, n // 2))
    ts_short = np.sort(rng.uniform(0, 50 * tau, n // 2))
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "k": np.repeat(np.array([1, 2], dtype=np.int64), n // 2),
            "ts": pd.to_datetime(
                (np.concatenate([ts_long, ts_short]) * 1e6).astype(
                    "int64"
                ),
                unit="us",
            ),
            "v": rng.uniform(-5, 5, n),
        }
    )
    got = (
        ewma_by(
            rd.from_pandas(df).repartition(6), key_col="k",
            ts_col="ts", value_col="v", id_col="id",
            tau_s=tau, bucket_s=86_400, n_shards=8,
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert len(got) == n
    ref = np.zeros(n)
    for k in (1, 2):
        sub = df[df.k == k].sort_values(["ts", "id"])
        s, prev = 0.0, None
        for _, r in sub.iterrows():
            t = r["ts"].value / 1e3
            if prev is not None:
                s *= np.exp(-(t - prev) / (tau * 1e6))
            s += r["v"]
            prev = t
            ref[r["id"]] = s
    assert np.allclose(
        got.set_index("id")["ewma"]
        .reindex(np.arange(n))
        .to_numpy(),
        np.round(ref, 6),
        rtol=1e-9, atol=2e-6,
    )


def test_pagerank_matches_dense_power_iteration(ray_session):
    """Distributed PageRank equals the dense numpy power iteration on
    a random directed graph with dangling nodes."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.graph import pagerank

    rng = np.random.default_rng(9)
    n, m, d = 60, 400, 0.85
    edges = pd.DataFrame(
        {
            "src": rng.integers(0, n, m),
            "dst": rng.integers(0, n, m),
        }
    ).drop_duplicates()
    # node 59 dangling: no out-edges
    edges = edges[edges.src != n - 1].reset_index(drop=True)
    got = (
        pagerank(
            rd.from_pandas(edges).repartition(4), damping=d,
            n_iter=12, n_buckets=8,
        )
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )

    nodes = np.union1d(edges.src.unique(), edges.dst.unique())
    idx = {v: i for i, v in enumerate(nodes)}
    k = len(nodes)
    A = np.zeros((k, k))
    for _, r in edges.iterrows():
        A[idx[r.dst], idx[r.src]] += 1.0
    deg = A.sum(axis=0)
    out_deg = deg.copy()
    P = np.zeros_like(A)
    np.divide(A, out_deg, out=P, where=out_deg > 0)
    rank = np.full(k, 1.0 / k)
    for _ in range(12):
        dangling = rank[out_deg == 0].sum()
        rank = (1 - d) / k + d * (P @ rank + dangling / k)
    ref = pd.DataFrame({"node": nodes, "rank": rank}).sort_values(
        "node"
    )
    assert np.allclose(
        got["rank"].to_numpy(), ref["rank"].to_numpy(), atol=1e-12
    )
    assert abs(got["rank"].sum() - 1.0) < 1e-9


def test_versioned_layout_time_travel_and_vacuum(ray_session, tmp_path):
    """Append creates a new readable version without disturbing the
    old one; overwrite starts fresh but keeps time travel; vacuum
    removes only files no kept manifest references."""
    import glob

    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.layout import (
        vacuum_versions, versioned_read, versioned_write,
    )

    path = str(tmp_path / "tbl")
    df1 = pd.DataFrame({"k": [1, 2, 3]})
    df2 = pd.DataFrame({"k": [4, 5]})
    df3 = pd.DataFrame({"k": [9]})
    assert versioned_write(rd.from_pandas(df1), path) == 1
    assert versioned_write(
        rd.from_pandas(df2), path, mode="append"
    ) == 2
    assert versioned_write(
        rd.from_pandas(df3), path, mode="overwrite"
    ) == 3

    assert sorted(
        versioned_read(path, 1).to_pandas()["k"]
    ) == [1, 2, 3]
    assert sorted(
        versioned_read(path, 2).to_pandas()["k"]
    ) == [1, 2, 3, 4, 5]
    assert sorted(versioned_read(path).to_pandas()["k"]) == [9]

    stats = vacuum_versions(path, keep=2)
    assert stats["dropped_versions"] == [1]
    # v2 and v3 still read intact; v1's exclusive files may be gone
    assert sorted(
        versioned_read(path, 2).to_pandas()["k"]
    ) == [1, 2, 3, 4, 5]
    assert sorted(versioned_read(path, 3).to_pandas()["k"]) == [9]
    # after dropping v2 too, its files are deleted
    stats = vacuum_versions(path, keep=1)
    assert stats["dropped_versions"] == [2]
    assert stats["files_removed"] >= 1
    assert sorted(versioned_read(path).to_pandas()["k"]) == [9]


def test_jsonl_tolerant_quarantines_bad_lines(ray_session, tmp_path):
    """Malformed JSONL lines become _corrupt rows carrying the raw
    line; every well-formed row survives with typed values."""
    import pandas as pd

    from unfurl_ray.sources.formats import read_jsonl_tolerant

    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"doc_id": 1, "source": "a", "n_chars": 10}\n'
        "this is not json\n"
        '{"doc_id": 2, "source": "b", "n_chars": 20}\n'
        '{"doc_id": 3, "source": "a", "n_chars": 30}\n'
        '{broken: [\n'
    )
    out = read_jsonl_tolerant(
        str(p), columns=["doc_id", "source", "n_chars"],
        dtypes={"doc_id": "int64", "source": "object",
                "n_chars": "int64"},
    ).to_pandas()
    good = out[~out["_corrupt"]].sort_values("doc_id")
    bad = out[out["_corrupt"]]
    assert good["doc_id"].tolist() == [1, 2, 3]
    assert good["n_chars"].tolist() == [10, 20, 30]
    assert len(bad) == 2
    assert "this is not json" in bad["_raw"].tolist()


def test_validate_table_counts_violations(ray_session):
    """Every rule kind counts its violations on a deliberately dirty
    table: dup keys, nulls, out-of-range, bad enum, dangling FK."""
    import numpy as np
    import pandas as pd
    import ray
    import ray.data as rd

    from unfurl_ray.ops.validate import validate_table

    df = pd.DataFrame(
        {
            "k": [1, 2, 2, 3, 3, 3, 4],
            "fk": [10, 10, 99, 20, None, 20, 98],
            "v": [5.0, -1.0, 50.0, 200.0, 5.0, 5.0, 5.0],
            "s": ["a", "a", "b", "zz", "b", "a", "zz"],
        }
    )
    out = validate_table(
        rd.from_pandas(df).repartition(3),
        [
            {"rule": "k_unique", "kind": "unique", "col": "k"},
            {"rule": "fk_not_null", "kind": "not_null", "col": "fk"},
            {"rule": "v_range", "kind": "in_range", "col": "v",
             "lo": 0.0, "hi": 100.0},
            {"rule": "s_enum", "kind": "in_set", "col": "s",
             "values": ["a", "b"]},
            {"rule": "fk_ref", "kind": "ref", "col": "fk"},
        ],
        ref_keys=ray.put(np.array([10, 20])),
    ).set_index("rule")["violations"]
    assert out["k_unique"] == 3       # 2x2 + 3x3 -> 1 + 2 extras
    assert out["fk_not_null"] == 1
    assert out["v_range"] == 2        # -1 and 200
    assert out["s_enum"] == 2         # two 'zz'
    # SQL NULL semantics: the null fk is NOT a ref violation (it is
    # the not_null rule's job) — only 99 and 98 dangle
    assert out["fk_ref"] == 2


def test_ivf_append_incremental(ray_session, tmp_path):
    """IvfIndex.append adds new vectors to the existing partitions
    without re-clustering; with nprobe = all lists the search is
    exact, so post-append results must equal brute force over the
    FULL corpus."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.similarity import IvfIndex, knn_brute

    rng = np.random.default_rng(13)
    dim, n = 16, 400
    emb = rng.standard_normal((n, dim))
    df = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": list(emb),
        }
    )
    half1 = rd.from_pandas(df.iloc[:200]).repartition(2)
    half2 = rd.from_pandas(df.iloc[200:]).repartition(2)
    idx = IvfIndex.build(half1, str(tmp_path / "ivf"), n_centroids=4)
    idx.append(half2)

    queries = rng.standard_normal((5, dim))
    order = ["query_id", "cosine", "vec_id"]
    got = (
        idx.search(queries, k=5, nprobe=4)
        .sort_values(order, ascending=[True, False, True])
        .reset_index(drop=True)
    )
    want = (
        knn_brute(rd.from_pandas(df).repartition(3), queries, k=5)
        .sort_values(order, ascending=[True, False, True])
        .reset_index(drop=True)
    )
    assert got["vec_id"].tolist() == want["vec_id"].tolist()


def test_sharded_neardup_index_cross_run(ray_session):
    """Streaming near-dup filter: run 2 drops documents
    near-identical (one-word edits) to run-1 admissions, keeps
    genuinely new text; within a run the first cluster member wins."""
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.stream_dedup import ShardedNearDupIndex

    base = (
        "the quick brown fox jumps over the lazy dog while the "
        "rain in spain falls mainly on the plain and the cat sat "
        "on the mat watching the birds fly south for the winter"
    )
    other = (
        "completely different content about distributed systems "
        "and arrow record batches streaming through object stores "
        "with backpressure and spilling to disk under memory "
        "pressure in large clusters"
    )
    near = base.replace("lazy", "sleepy")
    near2 = base.replace("winter", "autumn")

    idx = ShardedNearDupIndex(n_shards=4)
    run1 = pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": [base, other, near]}
    )
    kept1 = (
        idx.filter_new(rd.from_pandas(run1).repartition(1))
        .to_pandas()
    )
    # near (doc 3) collapses onto base within the same run
    assert sorted(kept1["doc_id"]) == [1, 2]

    run2 = pd.DataFrame(
        {
            "doc_id": [4, 5],
            "text": [near2, "a brand new short unrelated sentence "
                            "about gardening tomatoes in july"],
        }
    )
    kept2 = (
        idx.filter_new(rd.from_pandas(run2).repartition(1))
        .to_pandas()
    )
    assert sorted(kept2["doc_id"]) == [5]
    assert sum(idx.sizes()) > 0


def test_hll_set_ops_error_bounds(ray_session):
    """Union/intersection estimates land within ~5x the standard HLL
    error of the exact values on overlapping integer sets."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.sketch import hll_set_ops

    a = pd.DataFrame({"v": np.arange(0, 60_000, dtype=np.int64)})
    b = pd.DataFrame({"v": np.arange(40_000, 110_000, dtype=np.int64)})
    est = hll_set_ops(
        rd.from_pandas(a).repartition(4),
        rd.from_pandas(b).repartition(4), "v",
    )
    rel = 5 * 1.04 / np.sqrt(1 << 12)  # ~8.1%
    assert abs(est["n_a"] - 60_000) / 60_000 < rel
    assert abs(est["n_b"] - 70_000) / 70_000 < rel
    assert abs(est["n_union"] - 110_000) / 110_000 < rel
    assert abs(est["n_intersect"] - 20_000) / 20_000 < 0.25


def test_sliding_hll_tracks_exact_mau(ray_session):
    """The per-day-sketch sliding distinct stays within the HLL error
    bound of the exact pair-shuffle answer on every window day with
    support, including days the window only reaches by carry-over."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.sketch import sliding_distinct_hll

    rng = np.random.default_rng(11)
    n = 60_000
    day_us = 86_400_000_000
    days = rng.integers(0, 30, n)
    users = rng.integers(0, 5_000, n) + days * 37  # drifting actives
    df = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                days * day_us + rng.integers(0, day_us, n), unit="us"
            ),
            "user_id": users.astype(np.int64),
        }
    )
    got = sliding_distinct_hll(
        rd.from_pandas(df).repartition(8), "ts", "user_id",
        window=7, p=14,
    )
    pairs = pd.DataFrame(
        {"d": days, "u": users}
    ).drop_duplicates()
    exact = {}
    for wd in range(30):
        m = (pairs["d"] > wd - 7) & (pairs["d"] <= wd)
        exact[wd] = pairs.loc[m, "u"].nunique()
    rel = 5 * 1.04 / np.sqrt(1 << 14)  # ~4.1%
    g = got.set_index("wd")["estimate"]
    for wd, want in exact.items():
        assert abs(g.loc[wd] - want) / want < rel, (wd, g.loc[wd], want)


def test_logreg_irls_matches_reference(ray_session):
    """Distributed IRLS equals the single-process solver to ~1e-9 on
    a separable-ish random problem, regardless of batching."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.fit import logreg_irls, logreg_irls_reference

    rng = np.random.default_rng(21)
    n = 4000
    X = np.column_stack(
        [np.ones(n), rng.standard_normal(n), rng.standard_normal(n)]
    )
    true = np.array([-0.5, 2.0, -1.0])
    y = (
        rng.uniform(size=n) < 1 / (1 + np.exp(-(X @ true)))
    ).astype(np.int64)
    df = pd.DataFrame(
        {"const": X[:, 0], "x1": X[:, 1], "x2": X[:, 2], "y": y}
    )
    got = logreg_irls(
        rd.from_pandas(df).repartition(6),
        ["const", "x1", "x2"], "y", iters=8,
    )["beta"]
    want = logreg_irls_reference(X, y.astype(np.float64), iters=8)
    assert np.allclose(got, want, atol=1e-9)
    # and it actually learned the signal
    assert got[1] > 1.0 and got[2] < -0.5


def test_als_matches_reference(ray_session):
    """Distributed ALS tracks the single-process solver (same seed,
    same updates) to ~1e-6 and actually reconstructs a planted
    rank-2 structure."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.fit import als_implicit, als_implicit_reference

    rng = np.random.default_rng(3)
    n_users, n_items, kk = 300, 6, 2
    U = rng.standard_normal((n_users, kk))
    V = rng.standard_normal((n_items, kk))
    rows = []
    for u in range(n_users):
        for j in rng.choice(n_items, 4, replace=False):
            rows.append((u, int(j), float(U[u] @ V[j])))
    df = pd.DataFrame(rows, columns=["u", "j", "r"])
    got = als_implicit(
        rd.from_pandas(df).repartition(5), "u", "j", "r",
        n_items=n_items, k=kk, iters=6, n_shards=8,
    )
    want = als_implicit_reference(
        df, "u", "j", "r", n_items=n_items, k=kk, iters=6,
    )
    assert np.allclose(got["V"], want["V"], atol=1e-6)
    assert abs(got["rmse"] - want["rmse"]) < 1e-8
    assert got["rmse"] < 0.5  # planted structure recovered


def test_read_transcripts_iso_timestamps(ray_session, tmp_path):
    """JSONL dumps commonly carry ISO-8601 'T' timestamps (with or
    without fractional seconds) — the normalizer must accept them,
    not just the space-separated form."""
    import pandas as pd

    from unfurl_ray.sources.formats import read_transcripts

    p = tmp_path / "t.jsonl"
    p.write_text(
        '{"conv_id":"c1","turn_idx":0,"role":"user",'
        '"text":"hi","tool":"","ts":"2024-01-01T12:00:00"}\n'
        '{"conv_id":"c1","turn_idx":1,"role":"assistant",'
        '"text":"yo","tool":"","ts":"2024-01-01T12:00:01.250000"}\n'
    )
    out = read_transcripts(str(p), "jsonl").to_pandas()
    assert out["ts"].tolist() == [
        pd.Timestamp("2024-01-01 12:00:00"),
        pd.Timestamp("2024-01-01 12:00:01.250000"),
    ]


def test_phash_banded_hamming_pairs(ray_session):
    """Injected-backend pHash: prescribed feature vectors give known
    hashes; banded candidate generation finds all pairs within the
    Hamming budget and none beyond it."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.multimodal import (
        ImagePHash, phash_hamming_pairs,
    )

    base = np.zeros(64)
    base[::2] = 1.0  # alternating bits
    v2 = base.copy()
    v2[0] = 0.0  # flip ~1-2 bits vs base (median shifts none here)
    far = np.zeros(64)
    far[:8] = 1.0  # very different pattern

    class StubBackend:
        def features(self, data, dim=64):
            return {b"a": base, b"b": v2, b"c": far}[data]

    ds = rd.from_pandas(
        pd.DataFrame(
            {"doc_id": [1, 2, 3], "content": [b"a", b"b", b"c"]}
        )
    )
    hashed = ds.map_batches(
        lambda t: ImagePHash(backend=StubBackend())(t),
        batch_format="pyarrow",
    )
    pairs = (
        phash_hamming_pairs(hashed, max_dist=4)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert list(map(tuple, pairs[["id_a", "id_b"]].to_numpy())) == [
        (1, 2)
    ]
    assert int(pairs["dist"].iloc[0]) <= 4


def test_set_similarity_join_brute_parity(ray_session):
    """Prefix filtering must emit EXACTLY the brute-force Jaccard>=t
    pairs — candidate pruning is allowed to drop only non-matches."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.dedup import set_similarity_join, _ws_words

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for i in range(40):
        words = rng.choice(vocab, size=rng.integers(5, 30)).tolist()
        docs.append(" ".join(words))
    # planted near-identical pair
    docs.append(docs[0] + " extra")
    docs.append(docs[1])
    df = pd.DataFrame({"doc_id": np.arange(len(docs), dtype=np.int64),
                       "text": docs})

    def gramset(text, k=3):
        ws = _ws_words(text)
        return set(" ".join(ws[i:i+k]) for i in range(len(ws)-k+1)) \
            if len(ws) >= k else set()

    want = []
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            sa, sb = gramset(docs[a]), gramset(docs[b])
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            union = len(sa | sb)
            if inter * 10 >= 4 * union:
                want.append((a, b, np.floor(inter * 1e6 / union + 0.5) / 1e6))
    want = pd.DataFrame(want, columns=["doc_a", "doc_b", "jaccard"])
    want = want.astype({"doc_a": "int64", "doc_b": "int64"})

    got = set_similarity_join(
        rd.from_pandas(df).repartition(4), threshold=0.4, n_buckets=8
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True)
    )
    assert ((got["doc_a"] == 0) & (got["doc_b"] == 40)).any()
    assert ((got["doc_a"] == 1) & (got["doc_b"] == 41)).any()


def test_knn_pq_recall_and_determinism(ray_session):
    """PQ ANN: recall@10 vs brute >= 0.6 on the sf0.001 embeddings
    (unclustered — PQ's worst case) and bit-identical across runs."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd

    from unfurl_ray.ops.similarity import knn_brute, knn_pq

    sf = "/root/testdata/sf0.001"
    ds = rd.read_parquet(
        f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    t = pq.read_table(
        f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    mask = np.array(t.column("vec_id").to_pylist()) < 4
    qs = np.array(t.column("embedding").to_pylist())[mask]

    got = knn_pq(ds, qs, k=10)
    brute = knn_brute(ds, qs, k=10)
    recall = np.mean([
        len(set(brute[brute["query_id"] == qi]["vec_id"])
            & set(got[got["query_id"] == qi]["vec_id"])) / 10
        for qi in range(4)
    ])
    assert recall >= 0.6, f"recall@10 {recall}"
    again = knn_pq(ds, qs, k=10)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), again.reset_index(drop=True)
    )


def test_pagerank_shard_edge_dedup_parity(ray_session):
    """dedup_edges=True on duplicated edge input must equal the
    pre-deduped run — shard-local unique is a global edge dedup."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.graph import pagerank

    u = np.array([0, 1, 2, 3, 4, 0, 1], dtype=np.int64)
    v = np.array([1, 2, 3, 4, 0, 2, 3], dtype=np.int64)
    base = pd.DataFrame(
        {"src": np.concatenate([u, v]), "dst": np.concatenate([v, u])}
    )
    dup = pd.concat([base, base.iloc[::2], base.iloc[:5]])
    want = (
        pagerank(rd.from_pandas(base).repartition(2), n_iter=6,
                 n_buckets=3)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    got = (
        pagerank(rd.from_pandas(dup).repartition(3), n_iter=6,
                 n_buckets=3, dedup_edges=True)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_bpe_fit_collision_corpus_parity(ray_session):
    """Two-letter alphabet: merged-symbol strings collide constantly
    ('a'+'ab' == 'aa'+'b' == 'aab'), the channel through which a
    batched round could pick a different order than sequential BPE —
    the collision-aware prover must still match exactly."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.bpe import bpe_fit, bpe_fit_reference

    rng = np.random.default_rng(5)
    vocab = ["".join(rng.choice(["a", "b"], rng.integers(2, 9)))
             for _ in range(40)]
    texts = [
        " ".join(rng.choice(vocab, rng.integers(3, 25)))
        for _ in range(300)
    ]
    ds = rd.from_pandas(
        pd.DataFrame({"text": texts})
    ).repartition(4).materialize()
    got = bpe_fit(ds, "text", n_merges=20, n_buckets=8)
    want = bpe_fit_reference(texts, 20)
    pd.testing.assert_frame_equal(got, want)


def test_sequential_prefix_collision_soundness():
    """Window where the accepted merge ('a','bc') creates the string
    'abc' that already exists as a symbol: the pre-existing pair
    ('x','abc') can GAIN the occurrences of ('x','a') and overtake
    later candidates, so the prover must stop the batch — accepting
    ('e','f') (the pre-fix behavior) would diverge from sequential."""
    import pandas as pd

    from unfurl_ray.ops.bpe import _sequential_prefix

    cand = pd.DataFrame(
        {
            "left": ["a", "e", "x", "x"],
            "right": ["bc", "f", "abc", "a"],
            "c": [100, 96, 95, 30],
        }
    )
    chosen = _sequential_prefix(cand, cutoff=10, limit=8)
    # ('a','bc') is the unconditional argmax; nothing after it is
    # provable here: ('x','abc') may rise to 95 + 30 = 125 > 96
    assert chosen == [("a", "bc", 100)]


def test_corr_matrix_matches_numpy(ray_session):
    """Chan co-moment fold across many small blocks == one-shot
    np.corrcoef, including a NULL row drop."""
    import numpy as np
    import pandas as pd
    import ray

    from unfurl_ray.ops.profile import corr_matrix

    rng = np.random.default_rng(7)
    n = 5000
    x = rng.normal(1000.0, 200.0, n)
    df = pd.DataFrame(
        {
            "a": x,
            "b": 0.8 * x + rng.normal(0, 50.0, n),
            "c": rng.uniform(0, 1, n),
        }
    )
    df.loc[17, "b"] = np.nan  # any-null row must drop everywhere
    ds = ray.data.from_pandas(df).repartition(23)
    got = corr_matrix(ds, ["a", "b", "c"])

    kept = df.dropna().to_numpy()
    ref = np.corrcoef(kept, rowvar=False)
    want = {
        ("a", "b"): ref[0, 1],
        ("a", "c"): ref[0, 2],
        ("b", "c"): ref[1, 2],
    }
    assert len(got) == 3
    for _, row in got.iterrows():
        assert abs(row["corr"] - want[(row["col_a"], row["col_b"])]) \
            < 1e-6


def test_edit_distance_join_brute_parity(ray_session):
    """FastSS-blocked join == brute O(n^2) banded Levenshtein, at
    k=1 and k=2, over strings planted with subs/inserts/deletes,
    empties, and exact dups."""
    import numpy as np
    import pandas as pd
    import ray

    from unfurl_ray.ops.dedup import _lev_leq, edit_distance_join

    rng = np.random.default_rng(11)
    base = [
        "".join(rng.choice(list("abcdef "), size=rng.integers(5, 30)))
        for _ in range(60)
    ]
    texts = list(base)
    for s in base[:20]:
        i = int(rng.integers(0, max(1, len(s))))
        texts.append(s[:i] + "x" + s[i + 1:])   # substitution
        texts.append(s[:i] + "q" + s[i:])       # insertion
        texts.append(s[:i] + s[i + 1:])         # deletion
    texts += ["", "", "a", base[0], base[0]]
    df = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64),
         "text": texts}
    )

    import re
    def key(t):
        return re.sub(r"[ \t\n\f\r]+", " ", t.lower()).strip()[:24]

    for k in (1, 2):
        got = edit_distance_join(
            ray.data.from_pandas(df).repartition(7), k=k
        )
        want = set()
        for i in range(len(texts)):
            for j in range(i + 1, len(texts)):
                d = _lev_leq(key(texts[i]), key(texts[j]), k)
                if d <= k:
                    want.add((i, j, d))
        got_set = set(
            zip(got["doc_a"].astype(int), got["doc_b"].astype(int),
                got["dist"].astype(int))
        )
        assert got_set == want, f"k={k}: {got_set ^ want}"

    # _lev_leq itself vs a reference full DP
    def full_dp(a, b):
        m, n = len(a), len(b)
        dp = list(range(n + 1))
        for i in range(1, m + 1):
            prev, dp[0] = dp[0], i
            for j in range(1, n + 1):
                cur = dp[j]
                dp[j] = min(dp[j] + 1, dp[j - 1] + 1,
                            prev + (a[i - 1] != b[j - 1]))
                prev = cur
        return dp[n]

    for _ in range(200):
        a = "".join(rng.choice(list("ab "), size=rng.integers(0, 9)))
        b = "".join(rng.choice(list("ab "), size=rng.integers(0, 9)))
        for k in (1, 2, 3):
            d = full_dp(a, b)
            assert _lev_leq(a, b, k) == (d if d <= k else k + 1)


def test_global_row_number_dense_and_stable(ray_session):
    """rn is a dense 1..n permutation matching the sort order, with
    heavy key duplication broken by the id tiebreaker, across many
    blocks."""
    import numpy as np
    import pandas as pd
    import ray

    from unfurl_ray.ops.relational import global_row_number

    rng = np.random.default_rng(3)
    n = 4000
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "k": rng.integers(0, 7, n),  # ~570 dups per key value
        }
    )
    out = (
        global_row_number(
            ray.data.from_pandas(df).repartition(17), ["k", "id"]
        )
        .to_pandas()
        .sort_values("rn")
        .reset_index(drop=True)
    )
    assert list(out["rn"]) == list(range(1, n + 1))
    want = df.sort_values(["k", "id"]).reset_index(drop=True)
    assert list(out["id"]) == list(want["id"])


def test_sorted_neighborhood_matches_brute_window(ray_session):
    """SNM fan-out pairs == brute rank-window pairs, no dups, no
    misses across bucket boundaries."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray

    from unfurl_ray.ops.dedup import _lev_leq
    from unfurl_ray.ops.relational import sorted_neighborhood_join

    rng = np.random.default_rng(5)
    keys = [
        "".join(rng.choice(list("abc"), size=rng.integers(1, 8)))
        for _ in range(300)
    ]
    df = pd.DataFrame(
        {"doc_id": np.arange(300, dtype=np.int64), "text": keys}
    )

    def keyed(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "s": batch.column("text"),
            }
        )

    w, md = 4, 2
    got = sorted_neighborhood_join(
        ray.data.from_pandas(df).repartition(11), keyed,
        window=w, max_dist=md,
    )
    ranked = df.assign(s=df["text"]).sort_values(
        ["s", "doc_id"]
    ).reset_index(drop=True)
    want = set()
    for i in range(len(ranked)):
        for j in range(i + 1, min(i + w + 1, len(ranked))):
            d = _lev_leq(ranked["s"][i], ranked["s"][j], md)
            if d <= md:
                a, b = int(ranked["doc_id"][i]), int(ranked["doc_id"][j])
                want.add((min(a, b), max(a, b), d))
    got_list = list(
        zip(got["doc_a"].astype(int), got["doc_b"].astype(int),
            got["dist"].astype(int))
    )
    assert len(got_list) == len(set(got_list)), "duplicate pairs"
    assert set(got_list) == want


def test_bfs_hops_matches_driver_bfs(ray_session):
    """Shard-actor BFS == networkx-free reference BFS: random graph +
    a 12-node chain (needs every round), multi-source, absent seeds,
    hop cap, and the all-unreachable empty result."""
    from collections import deque

    import numpy as np
    import pandas as pd
    import ray

    from unfurl_ray.ops.graph import bfs_hops

    rng = np.random.default_rng(13)
    u = rng.integers(0, 60, 150)
    v = rng.integers(0, 60, 150)
    keep = u != v
    u, v = u[keep], v[keep]
    # a chain hanging off node 0: 100..111
    chain = np.arange(100, 112, dtype=np.int64)
    cu = np.concatenate([[0], chain[:-1]])
    cv = chain
    u = np.concatenate([u, cu])
    v = np.concatenate([v, cv])
    both = pd.DataFrame(
        {"u": np.concatenate([u, v]), "v": np.concatenate([v, u])}
    )
    seeds = [0, 7, 9999]  # 9999 absent from the graph
    max_hops = 20

    adj: dict[int, set] = {}
    for a, b in zip(both["u"], both["v"]):
        adj.setdefault(int(a), set()).add(int(b))
    want: dict[int, int] = {}
    dq = deque()
    for s in seeds:
        if s in adj:
            want[s] = 0
            dq.append(s)
    while dq:
        n = dq.popleft()
        if want[n] >= max_hops:
            continue
        for m in adj.get(n, ()):
            if m not in want:
                want[m] = want[n] + 1
                dq.append(m)

    ds = ray.data.from_pandas(both).repartition(9)
    got = bfs_hops(ds, seeds=np.array(seeds), max_hops=max_hops,
                   num_partitions=5)
    got_map = dict(zip(got["node"].astype(int), got["hops"].astype(int)))
    assert got_map == want
    assert max(want.values()) >= 12  # the chain actually exercised depth

    # hop cap truncates
    got2 = bfs_hops(ds, seeds=np.array([0]), max_hops=2,
                    num_partitions=4)
    assert int(got2["hops"].max()) == 2

    # all seeds absent -> clean empty typed frame
    got3 = bfs_hops(ds, seeds=np.array([777777]), max_hops=3)
    assert len(got3) == 0 and list(got3.columns) == ["node", "hops"]


def test_collapse_runs_stitches_block_edges(ray_session):
    """Distributed RLE == pandas reference RLE, with blocks sliced so
    runs provably cross block edges (incl. a run spanning >= 3 whole
    blocks, exercising the chained stitch through single-run blocks)."""
    import numpy as np
    import pandas as pd
    import ray

    from unfurl_ray.ops.relational import collapse_runs

    rng = np.random.default_rng(7)
    n = 400
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 5, n),
            "event_type": rng.choice(["a", "b"], n),  # long runs likely
            "ts": pd.to_datetime(
                rng.integers(0, 10_000, n), unit="s"
            ).astype("datetime64[us]"),
            "event_id": np.arange(n, dtype=np.int64),
        }
    )
    # one run guaranteed to span many blocks: user 9, 120 equal rows
    big = pd.DataFrame(
        {
            "user_id": 9,
            "event_type": "a",
            "ts": pd.to_datetime(
                np.arange(120) + 20_000, unit="s"
            ).astype("datetime64[us]"),
            "event_id": np.arange(1000, 1120, dtype=np.int64),
        }
    )
    df = pd.concat([df, big], ignore_index=True)

    # reference RLE
    ref = df.sort_values(["user_id", "ts", "event_id"]).reset_index(
        drop=True
    )
    brk = (ref["user_id"].ne(ref["user_id"].shift())
           | ref["event_type"].ne(ref["event_type"].shift()))
    ref["_rid"] = brk.cumsum()
    want = (
        ref.groupby("_rid")
        .agg(
            user_id=("user_id", "first"),
            event_type=("event_type", "first"),
            run_len=("event_type", "size"),
            start_ts=("ts", "first"),
            end_ts=("ts", "last"),
        )
        .reset_index(drop=True)
        .sort_values(["user_id", "start_ts", "event_type", "run_len"])
        .reset_index(drop=True)
    )
    want["run_len"] = want["run_len"].astype("int64")

    ds = ray.data.from_pandas(df).repartition(40)  # ~13 rows/block
    got = (
        collapse_runs(ds, "user_id", "event_type", ["ts", "event_id"])
        .to_pandas()
        .sort_values(["user_id", "start_ts", "event_type", "run_len"])
        .reset_index(drop=True)
    )[want.columns.tolist()]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert int(want["run_len"].max()) == 120  # the planted giant run


def test_roc_auc_matches_brute_pair_count(ray_session):
    """Distributed midrank AUC == the O(n^2) pair definition
    (P(score_pos > score_neg) + 0.5 P(=)), on data with heavy ties
    and blocks split so the offset stitch is exercised; plus the
    degenerate one-class NaN case."""
    import numpy as np
    import pandas as pd
    import ray

    from unfurl_ray.ops.fit import roc_auc

    rng = np.random.default_rng(11)
    n = 500
    score = rng.integers(0, 20, n).astype(np.float64)  # heavy ties
    y = (rng.random(n) < 1 / (1 + np.exp(2 - score / 5))).astype(
        np.int64
    )
    if y.sum() == 0 or y.sum() == n:  # keep both classes
        y[0], y[1] = 0, 1

    pos = score[y == 1][:, None]
    neg = score[y == 0][None, :]
    want = (
        (pos > neg).sum() + 0.5 * (pos == neg).sum()
    ) / (len(pos) * neg.shape[1])

    ds = ray.data.from_pandas(
        pd.DataFrame({"score": score, "y": y})
    ).repartition(16)
    got = roc_auc(ds, "score", "y")
    assert abs(got["auc"] - want) < 1e-12
    assert got["n_pos"] == int(y.sum())
    assert got["n_neg"] == int(n - y.sum())

    one_class = ray.data.from_pandas(
        pd.DataFrame({"score": score[:10], "y": np.ones(10, np.int64)})
    )
    import math
    assert math.isnan(roc_auc(one_class, "score", "y")["auc"])


def test_mutual_information_identities(ray_session):
    """MI == 0 for independent columns (exact uniform grid), MI ==
    H(X) == H(Y) for a bijection, and MI matches a scipy-free direct
    computation on a random joint."""
    import numpy as np
    import pandas as pd
    import ray

    from unfurl_ray.ops.profile import mutual_information

    # exact independence: full cartesian grid, equal counts
    grid = pd.DataFrame(
        [(x, y) for x in "abc" for y in range(4) for _ in range(5)],
        columns=["x", "y"],
    )
    r = mutual_information(
        ray.data.from_pandas(grid).repartition(6), "x", "y", ndigits=9
    )
    assert abs(float(r["mi"].iloc[0])) < 1e-9

    # bijection: MI = H(X) = H(Y)
    bij = pd.DataFrame(
        {"x": list("aabbbcccc"), "y": [0] * 2 + [1] * 3 + [2] * 4}
    )
    r2 = mutual_information(
        ray.data.from_pandas(bij).repartition(3), "x", "y", ndigits=9
    )
    p = np.array([2, 3, 4]) / 9.0
    h = float(-(p * np.log(p)).sum())
    for c in ("mi", "h_x", "h_y"):
        assert abs(float(r2[c].iloc[0]) - h) < 1e-9

    # random joint vs direct definition
    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {"x": rng.choice(list("pqr"), 300), "y": rng.integers(0, 5, 300)}
    )
    r3 = mutual_information(
        ray.data.from_pandas(df).repartition(7), "x", "y", ndigits=9
    )
    ct = df.value_counts().rename("n").reset_index()
    n = ct["n"].to_numpy(float)
    tot = n.sum()
    nx = ct.groupby("x")["n"].transform("sum").to_numpy(float)
    ny = ct.groupby("y")["n"].transform("sum").to_numpy(float)
    want = ((n / tot) * np.log(n * tot / (nx * ny))).sum()
    assert abs(float(r3["mi"].iloc[0]) - want) < 1e-9


def test_prefix_containment_dedup_planted(ray_session):
    """Planted prefix chains vs a brute-force O(n^2) reference:
    chained containment (a < ab < abc), an exact dup that only
    normalization reveals, a prefix whose extension sorts between it
    and an unrelated sibling, and an under-block_chars doc out of
    scope."""
    import numpy as np
    import pandas as pd
    import ray

    from unfurl_ray.ops.dedup import prefix_containment_dedup

    base = "the quick brown fox jumps over the lazy dog"
    docs = {
        0: base,                       # prefix of 1 and 2
        1: base + " again and again",  # prefix of 2
        2: base + " again and again more",
        3: "The   Quick\tbrown fox JUMPS over the lazy dog",  # exact dup of 0 after norm
        4: "completely different content that is long enough",
        5: "zz " + "a" * 30,           # prefix of 7, NOT of 6
        6: "zz " + "a" * 30 + "a",     # extension of 5 (sorts between 5 and 7)
        7: "zz " + "a" * 30 + "b tail",
        8: "short",                    # under block_chars, out of scope
    }
    df = pd.DataFrame(
        {"doc_id": list(docs), "text": list(docs.values())}
    )

    # brute reference
    import re
    norm = {
        k: re.sub(r"[ \t\n\f\r]+", " ", v.lower()).strip()
        for k, v in docs.items()
    }
    norm = {k: v for k, v in norm.items() if len(v) >= 24}
    want = {}
    for a, sa in norm.items():
        exact = any(
            sb == sa and b < a for b, sb in norm.items() if b != a
        )
        pref = any(
            len(sb) > len(sa) and sb.startswith(sa)
            for b, sb in norm.items() if b != a
        )
        if exact:
            want[a] = "exact"
        elif pref:
            want[a] = "prefix"

    got = prefix_containment_dedup(
        ray.data.from_pandas(df).repartition(4)
    ).to_pandas()
    got_map = dict(zip(got["doc_id"].astype(int), got["reason"]))
    assert got_map == want
    # spot-check the planted structure: 0 is a prefix of 1/2, 3 is an
    # exact dup of 0 after normalization, 5 is a prefix of 6 only
    # (6 diverges from 7 at the char after the shared run), 6/7 are
    # contained in nothing, 8 is under block_chars and out of scope
    assert want == {0: "prefix", 1: "prefix", 3: "exact", 5: "prefix"}


def test_best_split_matches_exact_greedy(ray_session):
    """Histogram split == brute-force exact greedy over every
    (feature, threshold) candidate, on a planted piecewise target
    where the winning split is known."""
    import numpy as np
    import pandas as pd
    import ray

    from unfurl_ray.ops.fit import best_split

    rng = np.random.default_rng(5)
    n = 2000
    f1 = rng.integers(0, 10, n).astype(np.float64)
    f2 = rng.integers(0, 4, n).astype(np.float64)
    # target jumps at f1 <= 6 — f1 at threshold 6 must win
    y = np.where(f1 <= 6, 10.0, 50.0) + rng.normal(0, 1, n)
    df = pd.DataFrame({"f1": f1, "f2": f2, "y": y})

    def sse(v):
        return float((v * v).sum() - v.sum() ** 2 / len(v)) if len(v) \
            else 0.0

    best_gain, best_key = -1.0, None
    for f in ("f1", "f2"):
        for t in np.unique(df[f])[:-1]:
            left = df.loc[df[f] <= t, "y"]
            right = df.loc[df[f] > t, "y"]
            gain = (sse(df["y"]) - sse(left) - sse(right)) / n
            if gain > best_gain + 1e-12:
                best_gain, best_key = gain, (f, float(t))

    got = best_split(
        ray.data.from_pandas(df).repartition(8), ["f1", "f2"], "y",
        gain_digits=6,
    )
    assert (got["feature"].iloc[0], float(got["threshold"].iloc[0])) \
        == best_key == ("f1", 6.0)
    assert abs(float(got["mean_gain"].iloc[0]) - best_gain) < 1e-5
    assert int(got["n_left"].iloc[0]) == int((f1 <= 6).sum())
    lm = float(df.loc[f1 <= 6, "y"].mean())
    assert abs(float(got["left_mean"].iloc[0]) - lm) < 0.01


def test_kcore_matches_exact_peeling(ray_session):
    """Shard-actor k-core == driver-side exact peeling on a random
    graph plus a planted clique (which must survive) and a long chain
    (which must fully peel at k >= 2... chain nodes have degree 2, so
    they survive k=2 but die at k=3)."""
    import numpy as np
    import pandas as pd
    import ray

    from unfurl_ray.ops.graph import kcore

    rng = np.random.default_rng(17)
    u = rng.integers(0, 40, 120)
    v = rng.integers(0, 40, 120)
    keep = u != v
    pairs = {tuple(sorted((int(a), int(b))))
             for a, b in zip(u[keep], v[keep])}
    # planted 6-clique on 100..105: every node degree 5 inside
    for i in range(100, 106):
        for j in range(i + 1, 106):
            pairs.add((i, j))
    # chain 200..214: internal degree 2
    for i in range(200, 214):
        pairs.add((i, i + 1))
    ua = np.array([p[0] for p in pairs], dtype=np.int64)
    va = np.array([p[1] for p in pairs], dtype=np.int64)
    both = pd.DataFrame(
        {"u": np.concatenate([ua, va]), "v": np.concatenate([va, ua])}
    )

    def exact_kcore(k):
        adj: dict[int, set] = {}
        for a, b in pairs:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        alive = set(adj)
        while True:
            dead = {n for n in alive
                    if len(adj[n] & alive) < k}
            if not dead:
                break
            alive -= dead
        return {n: len(adj[n] & alive) for n in alive}

    ds = ray.data.from_pandas(both).repartition(7)
    for k in (2, 3, 4):
        got = kcore(ds, k=k, num_partitions=5).to_pandas()
        got_map = dict(
            zip(got["node"].astype(int), got["degree"].astype(int))
        )
        assert got_map == exact_kcore(k), f"k={k}"
    # sanity on the planted structure
    c3 = exact_kcore(3)
    assert all(n in c3 for n in range(100, 106))
    assert not any(n in c3 for n in range(200, 215))


def test_weighted_quantile_matches_reference(ray_session):
    """Owner-block weighted quantile == direct cumulative-weight scan,
    across quantiles, with duplicate values (histogram collapse),
    block-boundary targets, and zero-weight rows."""
    import numpy as np
    import pandas as pd
    import ray

    from unfurl_ray.ops.relational import weighted_quantile

    rng = np.random.default_rng(23)
    v = rng.integers(0, 50, 800).astype(np.float64)  # many dups
    w = rng.integers(0, 5, 800).astype(np.float64)   # some zeros
    df = pd.DataFrame({"v": v, "w": w})
    ds = ray.data.from_pandas(df).repartition(12)

    h = df.groupby("v", as_index=False)["w"].sum().sort_values("v")
    cw = h["w"].cumsum().to_numpy()
    tot = float(cw[-1])
    for q in (0.0, 0.1, 0.5, 0.9, 1.0):
        i = int(np.searchsorted(cw, q * tot))
        i = min(i, len(cw) - 1)
        want_v = float(h["v"].iloc[i])
        got = weighted_quantile(ds, "v", "w", q=q)
        assert got["value"] == want_v, q
        assert got["cum_weight"] == float(cw[i]), q
        assert got["total_weight"] == tot


def test_ks_test_matches_brute_ecdf(ray_session):
    """Distributed KS D == brute-force max ECDF gap, with ties and
    multi-block histograms; smallest-value tie-break."""
    import numpy as np
    import pandas as pd
    import ray

    from unfurl_ray.ops.profile import ks_test

    rng = np.random.default_rng(7)
    va = rng.integers(0, 40, 600).astype(np.float64)  # ties
    vb = (rng.integers(0, 40, 500) + rng.integers(0, 2, 500)).astype(
        np.float64
    )
    df = pd.DataFrame(
        {
            "v": np.concatenate([va, vb]),
            "g": ["a"] * len(va) + ["b"] * len(vb),
        }
    )
    ds = ray.data.from_pandas(df).repartition(9)
    got = ks_test(ds, "v", "g", "a", "b")

    grid = np.unique(df["v"].to_numpy())
    ca = np.searchsorted(np.sort(va), grid, side="right") / len(va)
    cb = np.searchsorted(np.sort(vb), grid, side="right") / len(vb)
    d = np.abs(ca - cb)
    i = int(d.argmax())
    assert got["ks_d"] == round(float(d[i]), 6)
    assert got["at_value"] == float(grid[i])
    assert got["n_a"] == len(va) and got["n_b"] == len(vb)


def test_spearman_matches_pandas_rank_corr(ray_session):
    """Both broadcast and join paths == pandas midrank Pearson."""
    import numpy as np
    import pandas as pd
    import ray

    from unfurl_ray.ops.profile import spearman_corr

    rng = np.random.default_rng(11)
    x = rng.integers(0, 30, 700).astype(np.float64)  # heavy ties
    y = x * 2.0 + rng.normal(0, 10, 700)
    df = pd.DataFrame({"x": x, "y": y})
    ds = ray.data.from_pandas(df).repartition(8)

    u = df["x"].rank(method="average").to_numpy()
    v = df["y"].rank(method="average").to_numpy()
    want = round(float(np.corrcoef(u, v)[0, 1]), 6)

    got = spearman_corr(ds, "x", "y")
    assert abs(got["rho"] - want) <= 1e-6
    assert got["n"] == 700

    joined = spearman_corr(ds, "x", "y", broadcast_limit=10)
    assert joined["rho"] == got["rho"]
    assert joined["n"] == 700


def test_gini_matches_sorted_rank_formula(ray_session):
    """Histogram-run Gini == textbook sorted-rank formula."""
    import numpy as np
    import pandas as pd
    import ray

    from unfurl_ray.ops.profile import gini

    rng = np.random.default_rng(3)
    w = np.round(rng.lognormal(3, 1, 900), 2)  # skewed, some ties
    ds = ray.data.from_pandas(pd.DataFrame({"w": w})).repartition(7)
    got = gini(ds, "w")

    v = np.sort(w)
    n = len(v)
    want = 2.0 * float(
        (np.arange(1, n + 1) * v).sum()
    ) / (n * float(v.sum())) - (n + 1.0) / n
    assert abs(got["gini"] - round(want, 6)) <= 1e-6
    assert got["n"] == n


def test_isotonic_fit_matches_sequential_pav(ray_session):
    """Parallel run-stack PAV == sequential element-wise PAV: same
    fitted value at every x, across blocks, ties, and equal means."""
    import numpy as np
    import pandas as pd
    import ray

    from unfurl_ray.ops.fit import isotonic_fit

    rng = np.random.default_rng(19)
    x = rng.integers(0, 80, 1200).astype(np.float64)
    p = 1.0 / (1.0 + np.exp(-(x - 40) / 10.0))
    y = (rng.random(1200) < p).astype(np.float64)
    df = pd.DataFrame({"x": x, "y": y})
    ds = ray.data.from_pandas(df).repartition(10)

    fit = isotonic_fit(ds, "x", "y")
    # monotone, contiguous, covers all data
    assert (fit["rate"].diff().dropna() > 0).all()
    assert fit["n"].sum() == 1200

    # sequential reference PAV over the per-x histogram
    h = df.groupby("x").agg(n=("y", "size"), s=("y", "sum"))
    h = h.sort_index()
    ns, ss, xe = [], [], []
    for xi, row in h.iterrows():
        ns.append(float(row["n"])); ss.append(float(row["s"]))
        xe.append(float(xi))
        while len(ns) > 1 and ss[-2] * ns[-1] >= ss[-1] * ns[-2]:
            ns[-2] += ns[-1]; ss[-2] += ss[-1]; xe[-2] = xe[-1]
            ns.pop(); ss.pop(); xe.pop()
    # fitted value per distinct x from the reference runs
    ref_rate = {}
    start = 0
    xs_sorted = h.index.to_numpy()
    for k in range(len(ns)):
        end_x = xe[k]
        while start < len(xs_sorted) and xs_sorted[start] <= end_x:
            ref_rate[float(xs_sorted[start])] = round(
                ss[k] / ns[k], 6
            )
            start += 1
    got_rate = {}
    for _, r in fit.iterrows():
        for xv in xs_sorted[
            (xs_sorted >= r["x_start"]) & (xs_sorted <= r["x_end"])
        ]:
            got_rate[float(xv)] = float(r["rate"])
    assert got_rate == ref_rate


def test_count_min_error_contract(ray_session):
    """CM estimates are one-sided (est >= true) and within the
    eps*N bound on an adversarial many-distinct-keys input; the
    distributed tree merge equals a single-process fold."""
    import numpy as np
    import pandas as pd
    import ray

    from unfurl_ray.ops.sketch import (
        cm_fold, cm_query, count_min_sketch,
    )

    rng = np.random.default_rng(5)
    # zipf-ish: few heavy keys + a long tail of distinct keys
    heavy = np.repeat(np.arange(10), 300)
    tail = rng.integers(1000, 50_000, 8_000)
    keys = np.concatenate([heavy, tail]).astype(np.int64)
    rng.shuffle(keys)
    ds = ray.data.from_pandas(
        pd.DataFrame({"k": keys})
    ).repartition(11)

    cm, n = count_min_sketch(ds, "k", width=2048, depth=4)
    assert n == len(keys)
    assert (cm.sum(axis=1) == len(keys)).all()  # each row folds all

    probe = np.arange(10, dtype=np.int64)
    est = cm_query(cm, probe)
    true = pd.Series(keys).value_counts()
    truth = np.array([true.get(k, 0) for k in probe])
    assert (est >= truth).all()
    assert (est - truth <= 2 * len(keys) * np.e / 2048).all()

    # distributed merge == single fold (associativity)
    ref = cm_fold(keys, width=2048, depth=4)
    assert (cm == ref).all()


def test_frequency_cap_keeps_k_lowest_ids(ray_session):
    """Cap keeps exactly min(k, group size) lowest ids per hash,
    across batch boundaries (planted 5-copy dup split over blocks)."""
    import pandas as pd
    import ray

    from unfurl_ray.ops.dedup import frequency_cap

    rows = [{"doc_id": i, "text": f"unique {i}"} for i in range(20)]
    rows += [{"doc_id": 100 + j, "text": "dup A"} for j in range(5)]
    rows += [{"doc_id": 200 + j, "text": "dup B"} for j in range(2)]
    df = pd.DataFrame(rows)
    ds = ray.data.from_pandas(df).repartition(6)

    out = frequency_cap(ds, k=2).to_pandas()
    kept = set(out["doc_id"])
    assert {100, 101} <= kept and not {102, 103, 104} & kept
    assert {200, 201} <= kept
    assert kept >= set(range(20))
    assert len(out) == 20 + 2 + 2


def test_ecdf_normalize_matches_reference(ray_session):
    """Per-row reference ECDF == brute searchsorted over the raw
    reference, including values below/above the reference range and
    exact ties."""
    import numpy as np
    import pandas as pd
    import ray

    from unfurl_ray.ops.profile import ecdf_normalize

    rng = np.random.default_rng(13)
    ref = rng.integers(10, 90, 500).astype(np.float64)
    q = np.concatenate(
        [[0.0, 9.9, 10.0, 95.0], rng.integers(0, 100, 200)]
    ).astype(np.float64)
    ref_ds = ray.data.from_pandas(
        pd.DataFrame({"v": ref})
    ).repartition(5)
    q_ds = ray.data.from_pandas(
        pd.DataFrame({"i": np.arange(len(q)), "x": q})
    ).repartition(4)

    out = ecdf_normalize(q_ds, "x", ref_ds, "v").to_pandas()
    out = out.sort_values("i").reset_index(drop=True)
    srt = np.sort(ref)
    want = np.searchsorted(srt, q, side="right") / len(ref)
    assert np.array_equal(
        out["ref_pct"].to_numpy(), np.round(want, 6)
    )


def test_grouped_weighted_quantile_matches_reference(ray_session):
    """Per-group weighted quantile == direct cumulative-weight scan,
    with ties, zero weights, and several quantiles."""
    import numpy as np
    import pandas as pd
    import ray

    from unfurl_ray.ops.relational import grouped_weighted_quantile

    rng = np.random.default_rng(29)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 4, 1000).astype(str),
            "v": rng.integers(0, 40, 1000).astype(np.float64),
            "w": rng.integers(0, 6, 1000).astype(np.float64),
        }
    )
    ds = ray.data.from_pandas(df).repartition(8)
    for q in (0.1, 0.5, 0.9):
        got = (
            grouped_weighted_quantile(ds, "k", "v", "w", q=q)
            .to_pandas().set_index("k")
        )
        for k, g in df.groupby("k"):
            h = g.groupby("v")["w"].sum().sort_index()
            cw = h.cumsum().to_numpy()
            tot = float(cw[-1])
            i = min(int(np.searchsorted(cw, q * tot)), len(cw) - 1)
            assert got.loc[k, "wq_value"] == float(h.index[i]), (k, q)
            assert got.loc[k, "total_weight"] == tot


def test_bh_adjust_matches_sequential_reference(ray_session):
    """Distributed suffix-min BH == textbook single-pass BH, with
    duplicate p-values and multi-block inputs; adjusted p monotone
    in rank and capped at 1."""
    import numpy as np
    import pandas as pd
    import ray

    from unfurl_ray.ops.profile import bh_adjust

    rng = np.random.default_rng(37)
    p = np.round(rng.random(500), 3)  # many exact ties
    df = pd.DataFrame({"id": np.arange(500, dtype=np.int64), "p": p})
    ds = ray.data.from_pandas(df).repartition(7)

    out = (
        bh_adjust(ds, "p", "id").to_pandas()
        .sort_values("rank").reset_index(drop=True)
    )
    ref = df.sort_values(["p", "id"]).reset_index(drop=True)
    m = len(ref)
    crit = ref["p"].to_numpy() * m / np.arange(1, m + 1)
    adj = np.minimum(np.minimum.accumulate(crit[::-1])[::-1], 1.0)
    assert np.array_equal(out["id"].to_numpy(), ref["id"].to_numpy())
    assert np.array_equal(out["p_adj"].to_numpy(), adj)
    assert (np.diff(out["p_adj"].to_numpy()) >= 0).all()


def test_pareto_frontier_matches_brute_dominance(ray_session):
    """Distributed frontier == brute-force strict-x dominance check,
    with ties on both axes and multi-block inputs."""
    import numpy as np
    import pandas as pd
    import ray

    from unfurl_ray.ops.relational import pareto_frontier_2d

    rng = np.random.default_rng(41)
    df = pd.DataFrame(
        {
            "i": np.arange(800, dtype=np.int64),
            "x": rng.integers(0, 50, 800).astype(np.float64),
            "y": rng.integers(0, 50, 800).astype(np.float64),
        }
    )
    ds = ray.data.from_pandas(df).repartition(9)
    got = set(
        pareto_frontier_2d(ds, "x", "y").to_pandas()["i"]
    )

    x, y = df["x"].to_numpy(), df["y"].to_numpy()
    want = {
        int(df["i"].iloc[k])
        for k in range(len(df))
        if not ((x > x[k]) & (y >= y[k])).any()
    }
    assert got == want


def test_group_roc_auc_matches_pair_definition(ray_session):
    """Per-group midrank AUC == the O(n^2) pair definition
    (P(score_pos > score_neg) + 0.5 P(tie)) within every group."""
    import numpy as np
    import pandas as pd
    import ray

    from unfurl_ray.ops.fit import group_roc_auc

    rng = np.random.default_rng(43)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 3, 600).astype(str),
            "s": rng.integers(0, 25, 600).astype(np.float64),
            "y": rng.integers(0, 2, 600).astype(np.int64),
        }
    )
    ds = ray.data.from_pandas(df).repartition(8)
    got = (
        group_roc_auc(ds, "g", "s", "y").to_pandas()
        .set_index("k")
    )
    for g, sub in df.groupby("g"):
        pos = sub.loc[sub["y"] == 1, "s"].to_numpy()
        neg = sub.loc[sub["y"] == 0, "s"].to_numpy()
        wins = (pos[:, None] > neg[None, :]).sum()
        ties = (pos[:, None] == neg[None, :]).sum()
        want = (wins + 0.5 * ties) / (len(pos) * len(neg))
        assert got.loc[g, "auc"] == round(float(want), 6), g
        assert got.loc[g, "n_pos"] == len(pos)
        assert got.loc[g, "n_neg"] == len(neg)


def test_cm_join_size_bounds_exact_join(ray_session):
    """CM inner-product estimate >= exact join cardinality and within
    the eps bound; exact on a collision-free width."""
    import numpy as np
    import pandas as pd
    import ray

    from unfurl_ray.ops.sketch import cm_join_size, count_min_sketch

    rng = np.random.default_rng(47)
    a = rng.integers(0, 200, 3000).astype(np.int64)
    b = rng.integers(100, 300, 2000).astype(np.int64)
    ds_a = ray.data.from_pandas(pd.DataFrame({"k": a})).repartition(6)
    ds_b = ray.data.from_pandas(pd.DataFrame({"k": b})).repartition(5)
    cm_a, na = count_min_sketch(ds_a, "k", width=8192)
    cm_b, nb = count_min_sketch(ds_b, "k", width=8192)
    est = cm_join_size(cm_a, cm_b)

    ca = pd.Series(a).value_counts()
    cb = pd.Series(b).value_counts()
    exact = int((ca * cb).dropna().sum())
    assert est >= exact
    assert est - exact <= np.e * na * nb / 8192


def test_grouped_gini_matches_sorted_rank_formula(ray_session):
    """Per-group Gini == textbook sorted-rank formula per group."""
    import numpy as np
    import pandas as pd
    import ray

    from unfurl_ray.ops.profile import grouped_gini

    rng = np.random.default_rng(53)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 3, 600).astype(str),
            "w": np.round(rng.lognormal(2, 1, 600), 2),
        }
    )
    ds = ray.data.from_pandas(df).repartition(7)
    got = grouped_gini(ds, "g", "w").to_pandas().set_index("k")
    for g, sub in df.groupby("g"):
        v = np.sort(sub["w"].to_numpy())
        n = len(v)
        want = 2.0 * float(
            (np.arange(1, n + 1) * v).sum()
        ) / (n * float(v.sum())) - (n + 1.0) / n
        assert abs(got.loc[g, "gini"] - round(want, 6)) <= 1e-6, g
        assert got.loc[g, "n"] == n


def test_conditional_entropy_identities(ray_session):
    """H(Y|X) = H(Y) - MI and 0 <= U <= 1; U = 1 when Y is a
    function of X, U = 0 under independence."""
    import numpy as np
    import pandas as pd
    import ray

    from unfurl_ray.ops.profile import conditional_entropy

    x = np.repeat(["a", "b", "c"], 200)
    y_det = np.repeat([0, 1, 2], 200)  # Y = f(X)
    ds = ray.data.from_pandas(
        pd.DataFrame({"x": x, "y": y_det})
    ).repartition(5)
    out = conditional_entropy(ds, "x", "y").iloc[0]
    assert out["h_y_given_x"] == 0.0
    assert out["u_y_given_x"] == 1.0

    rng = np.random.default_rng(59)
    y_ind = rng.integers(0, 3, 600)  # independent of X
    ds2 = ray.data.from_pandas(
        pd.DataFrame({"x": x, "y": y_ind})
    ).repartition(5)
    out2 = conditional_entropy(ds2, "x", "y").iloc[0]
    assert 0.0 <= out2["u_y_given_x"] < 0.02


def test_spearman_actor_pool_path(ray_session):
    """The >100k-distinct rank-map path (object-store broadcast +
    actor pool) returns the same rho as the task-closure path."""
    import numpy as np
    import pandas as pd
    import ray

    from unfurl_ray.ops.profile import spearman_corr

    rng = np.random.default_rng(61)
    n = 120_001  # distinct count > the 100k task-closure cutoff
    x = rng.permutation(n).astype(np.float64)
    y = x + rng.normal(0, n / 10, n)
    ds = ray.data.from_pandas(
        pd.DataFrame({"x": x, "y": y})
    ).repartition(6)
    got = spearman_corr(ds, "x", "y")

    u = pd.Series(x).rank(method="average").to_numpy()
    v = pd.Series(y).rank(method="average").to_numpy()
    want = round(float(np.corrcoef(u, v)[0, 1]), 6)
    assert abs(got["rho"] - want) <= 1e-6
    assert got["n"] == n


def test_grouped_isotonic_matches_per_group_pav(ray_session):
    """Per-group PAV == running single-group isotonic_fit on each
    group separately."""
    import numpy as np
    import pandas as pd
    import ray

    from unfurl_ray.ops.fit import grouped_isotonic_fit, isotonic_fit

    rng = np.random.default_rng(67)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 3, 900).astype(str),
            "x": rng.integers(0, 40, 900).astype(np.float64),
        }
    )
    df["y"] = (
        rng.random(900) < 1 / (1 + np.exp(-(df["x"] - 20) / 6))
    ).astype(np.float64)
    ds = ray.data.from_pandas(df).repartition(8)

    got = (
        grouped_isotonic_fit(ds, "g", "x", "y").to_pandas()
        .sort_values(["k", "x_start"]).reset_index(drop=True)
    )
    for g, sub in df.groupby("g"):
        want = isotonic_fit(
            ray.data.from_pandas(sub[["x", "y"]]).repartition(3),
            "x", "y",
        )
        mine = got[got["k"] == g].reset_index(drop=True)
        assert np.array_equal(
            mine["rate"].to_numpy(), want["rate"].to_numpy()
        ), g
        assert np.array_equal(
            mine["x_start"].to_numpy(), want["x_start"].to_numpy()
        ), g
        assert int(mine["n"].sum()) == len(sub)


def test_kcore_full_peel_returns_typed_empty(ray_session):
    """A graph whose every node dies below k returns an empty frame
    WITH the (node, degree) schema, not a schema-less Dataset."""
    import pandas as pd
    import ray

    from unfurl_ray.ops.graph import kcore

    # chain: max degree 2, so k=3 peels everything
    e = pd.DataFrame({"u": [0, 1, 1, 2, 2, 3], "v": [1, 0, 2, 1, 3, 2]})
    ds = kcore(ray.data.from_pandas(e).repartition(3), k=3)
    schema = ds.schema()
    assert schema.names == ["node", "degree"]
    assert ds.count() == 0


def test_time_weighted_avg_matches_pandas(ray_session):
    """TWAP vs a per-key pandas reference; single-event and
    all-simultaneous keys are dropped like the twin's HAVING."""
    import pandas as pd
    import ray

    from unfurl_ray.ops.relational import time_weighted_avg

    rng = np.random.default_rng(7)
    n = 400
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "k": rng.integers(0, 12, n),
            "ts": pd.to_datetime(
                rng.integers(0, 10**7, n), unit="s"
            ).astype("datetime64[us]"),
            "v": rng.normal(10, 3, n),
        }
    )
    # key 10: single event; key 11: all events share one timestamp
    df = df[(df["k"] != 10) | (df.index == df[df["k"] == 10].index[0])]
    df.loc[df["k"] == 11, "ts"] = pd.Timestamp("2020-01-01")

    out = time_weighted_avg(
        ray.data.from_pandas(df).repartition(5),
        key_col="k", ts_col="ts", value_col="v", id_col="id",
    ).to_pandas().sort_values("k").reset_index(drop=True)

    want = {}
    for k, g in df.groupby("k"):
        g = g.sort_values(["ts", "id"])
        dt = g["ts"].astype("int64").diff().dropna().to_numpy()
        if len(dt) == 0 or dt.sum() == 0:
            continue
        want[k] = float((g["v"].to_numpy()[:-1] * dt).sum() / dt.sum())
    assert set(out["k"]) == set(want)
    for _, row in out.iterrows():
        assert abs(row["twap"] - want[row["k"]]) < 1e-9


def test_degree_assortativity_star_is_minus_one(ray_session):
    """A star graph is perfectly disassortative: r = -1."""
    import pandas as pd
    import ray

    from unfurl_ray.ops.graph import degree_assortativity

    e = pd.DataFrame({"a": [0] * 6, "b": [1, 2, 3, 4, 5, 6]})
    out = degree_assortativity(ray.data.from_pandas(e).repartition(3))
    assert out["n_directed"].iloc[0] == 12
    assert abs(out["assortativity"].iloc[0] + 1.0) < 1e-12


def test_common_neighbor_scores_hand_graph(ray_session):
    """Path 0-1-2 plus 2-3: (0, 2) are adjacent? no — edges are
    (0,1),(1,2),(2,3): pair (0,2) shares neighbor 1, jaccard
    1/(1+2-1); pair (1,3) shares 2, jaccard 1/(2+1-1)."""
    import pandas as pd
    import ray

    from unfurl_ray.ops.graph import common_neighbor_scores

    e = pd.DataFrame({"a": [0, 1, 2], "b": [1, 2, 3]})
    out = common_neighbor_scores(
        ray.data.from_pandas(e).repartition(2), top_k=10
    )
    got = {
        (int(r["x"]), int(r["y"])): (int(r["common"]), r["jaccard"])
        for _, r in out.iterrows()
    }
    assert got == {(0, 2): (1, 0.5), (1, 3): (1, 0.5)}


def test_ols_fit_matches_lstsq(ray_session):
    import pandas as pd
    import ray

    from unfurl_ray.ops.fit import ols_fit

    rng = np.random.default_rng(3)
    n = 5000
    x1, x2 = rng.normal(0, 2, n), rng.uniform(-1, 1, n)
    y = 3.0 + 1.5 * x1 - 2.25 * x2 + rng.normal(0, 0.5, n)
    df = pd.DataFrame({"y": y, "x1": x1, "x2": x2})
    out = ols_fit(
        ray.data.from_pandas(df).repartition(8), "y", ["x1", "x2"]
    )
    X = np.column_stack([np.ones(n), x1, x2])
    want, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert np.allclose(out["coef"].to_numpy(), want, atol=1e-8)


def test_kaplan_meier_hand_example(ray_session):
    """Classic worked example: durations 1,2,2,3,4 with events
    1,1,0,1,0 -> S(1)=4/5, S(2)=4/5*3/4=3/5, S(3)=3/5*1/2=3/10."""
    import pandas as pd
    import ray

    from unfurl_ray.ops.fit import kaplan_meier

    df = pd.DataFrame(
        {"dur": [1, 2, 2, 3, 4], "ev": [1, 1, 0, 1, 0]}
    )
    out = kaplan_meier(
        ray.data.from_pandas(df).repartition(3), "dur", "ev"
    )
    assert out["t"].tolist() == [1, 2, 3]
    assert out["n_risk"].tolist() == [5, 4, 2]
    assert out["d"].tolist() == [1, 1, 1]
    assert np.allclose(out["survival"], [0.8, 0.6, 0.3])


def test_naive_bayes_probabilities_normalize(ray_session):
    """Smoothed conditionals sum to 1 over each feature's value set,
    and priors sum to 1."""
    import pandas as pd
    import ray

    from unfurl_ray.ops.fit import naive_bayes_fit

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "cls": rng.choice(["a", "b"], 300),
            "f1": rng.choice(["x", "y", "z"], 300),
            "f2": rng.choice(["p", "q"], 300),
        }
    )
    out = naive_bayes_fit(
        ray.data.from_pandas(df).repartition(4), "cls", ["f1", "f2"]
    )
    cond = out[out["feature"] != "__prior__"]
    for (_f, _c), sub in cond.groupby(["feature", "class"]):
        assert abs(np.exp(sub["logp"]).sum() - 1.0) < 1e-12
    pri = out[out["feature"] == "__prior__"]
    assert abs(np.exp(pri["logp"]).sum() - 1.0) < 1e-12


def test_autocorrelation_matches_definition(ray_session):
    import pandas as pd
    import ray

    from unfurl_ray.ops.profile import autocorrelation

    rng = np.random.default_rng(5)
    n = 200
    x = np.sin(np.arange(n) * 2 * np.pi / 7) + rng.normal(0, 0.1, n)
    df = pd.DataFrame({"t": np.arange(n, dtype=np.int64), "x": x})
    out = autocorrelation(
        ray.data.from_pandas(df).repartition(4), "t", "x", max_lag=7
    )
    m = x.mean()
    den = ((x - m) ** 2).sum()
    for k in range(1, 8):
        want = ((x[:-k] - m) * (x[k:] - m)).sum() / den
        got = out.loc[out["lag"] == k, "acf"].iloc[0]
        assert abs(got - want) < 1e-9, k
    # period-7 signal: lag-7 autocorrelation is the strongest
    assert out.loc[out["lag"] == 7, "acf"].iloc[0] > 0.8


def test_cross_correlation_recovers_known_lead(ray_session):
    """y = x shifted by 2 -> ccf peaks at lag +2 (x leads y)."""
    import pandas as pd
    import ray

    from unfurl_ray.ops.profile import cross_correlation

    rng = np.random.default_rng(9)
    n = 300
    x = rng.normal(0, 1, n)
    y = np.roll(x, 2) + rng.normal(0, 0.05, n)
    df = pd.DataFrame(
        {"t": np.arange(n, dtype=np.int64), "x": x, "y": y}
    )
    out = cross_correlation(
        ray.data.from_pandas(df).repartition(4), "t", "x", "y",
        max_lag=3,
    )
    best = out.loc[out["ccf"].idxmax()]
    assert int(best["lag"]) == 2
    assert best["ccf"] > 0.9


def test_feature_hash_deterministic_and_bounded(ray_session):
    import pandas as pd
    import ray

    from unfurl_ray.ops.textstats import feature_hash_tf

    df = pd.DataFrame(
        {"doc_id": [1, 2], "text": ["a b a c", "b b d"]}
    )
    ds = ray.data.from_pandas(df)
    o1 = feature_hash_tf(ds, "text", "doc_id", 16).to_pandas()
    o2 = feature_hash_tf(ds, "text", "doc_id", 16).to_pandas()
    o1 = o1.sort_values(["doc_id", "bucket"]).reset_index(drop=True)
    o2 = o2.sort_values(["doc_id", "bucket"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(o1, o2)
    assert o1["bucket"].between(0, 15).all()
    # doc 1 has tf: a=2, b=1, c=1 -> sum 4
    assert int(o1.loc[o1["doc_id"] == 1, "tf"].sum()) == 4


def test_sequence_ngrams_matches_pandas(ray_session):
    import pandas as pd
    import ray

    from unfurl_ray.ops.relational import sequence_ngrams

    rng = np.random.default_rng(13)
    n = 500
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "k": rng.integers(0, 8, n),
            "ts": pd.to_datetime(
                rng.integers(0, 10**6, n), unit="s"
            ).astype("datetime64[us]"),
            "tok": rng.choice(["a", "b", "c"], n),
        }
    )
    out = sequence_ngrams(
        ray.data.from_pandas(df).repartition(4),
        key_col="k", ts_col="ts", id_col="id", token_col="tok", n=2,
    ).to_pandas().sort_values(["g1", "g2"]).reset_index(drop=True)

    from collections import Counter
    want: Counter = Counter()
    for _, g in df.groupby("k"):
        toks = g.sort_values(["ts", "id"])["tok"].tolist()
        want.update(zip(toks, toks[1:]))
    got = {
        (r["g1"], r["g2"]): int(r["n"]) for _, r in out.iterrows()
    }
    assert got == dict(want)


def test_late_event_split_flags_behind_watermark(ray_session):
    """Arrival order 0..3; event 2 arrives with a timestamp far
    behind the running max -> late; closely-behind stays on time."""
    import pandas as pd
    import ray

    from unfurl_ray.ops.relational import late_event_split

    df = pd.DataFrame(
        {
            "id": [0, 1, 2, 3],
            "k": [7, 7, 7, 7],
            "ts": pd.to_datetime(
                [1000, 5000, 1500, 4800], unit="s"
            ).astype("datetime64[us]"),
        }
    )
    out = late_event_split(
        ray.data.from_pandas(df).repartition(2),
        key_col="k", ts_col="ts", id_col="id",
        allowed_lateness_us=1_000_000_000,  # 1000 s
    ).to_pandas().sort_values("id")
    # id2: ts 1500 < 5000 - 1000 -> late; id3: 4800 >= 4000 -> fine
    assert out["late"].tolist() == [0, 0, 1, 0]


def test_naive_bayes_apply_prefers_matching_class(ray_session):
    import pandas as pd
    import ray

    from unfurl_ray.ops.fit import naive_bayes_apply, naive_bayes_fit

    df = pd.DataFrame(
        {
            "cls": ["a"] * 50 + ["b"] * 50,
            "f": ["x"] * 45 + ["y"] * 5 + ["y"] * 45 + ["x"] * 5,
        }
    )
    ds = ray.data.from_pandas(df).repartition(3)
    model = naive_bayes_fit(ds, "cls", ["f"])
    scored = naive_bayes_apply(ds, model, ["f"]).to_pandas()
    assert (scored.loc[scored["f"] == "x", "predicted"] == "a").all()
    assert (scored.loc[scored["f"] == "y", "predicted"] == "b").all()


def test_g2_keyness_finds_planted_term(ray_session):
    import pandas as pd
    import ray

    from unfurl_ray.ops.textstats import g2_keyness

    base = "common words shared by both corpora every time"
    docs = [("en", base + " banana banana banana")] * 30 + [
        ("de", base)
    ] * 30
    df = pd.DataFrame(docs, columns=["lang", "text"])
    out = g2_keyness(
        ray.data.from_pandas(df).repartition(4),
        "text", "lang", "en", min_count=10, top_k=5,
    )
    assert out.iloc[0]["term"] == "banana"
    assert out.iloc[0]["b"] == 0


def test_resample_linear_hand_series(ray_session):
    """Days 10, 13, 16 with values 1, 4, 10 -> interpolated
    2,3 then 6,8; observed flags only at the three inputs."""
    import pandas as pd
    import ray

    from unfurl_ray.ops.relational import resample_linear

    df = pd.DataFrame(
        {
            "k": [1, 1, 1],
            "ts": pd.to_datetime(
                [10 * 86400, 13 * 86400, 16 * 86400], unit="s"
            ).astype("datetime64[us]"),
            "v": [1.0, 4.0, 10.0],
        }
    )
    out = resample_linear(
        ray.data.from_pandas(df).repartition(2),
        key_col="k", ts_col="ts", value_col="v",
    ).to_pandas().sort_values("unit")
    assert out["unit"].tolist() == list(range(10, 17))
    assert np.allclose(
        out["v"], [1.0, 2.0, 3.0, 4.0, 6.0, 8.0, 10.0]
    )
    assert out["observed"].tolist() == [1, 0, 0, 1, 0, 0, 1]


def test_cume_dist_matches_pandas_rank(ray_session):
    import pandas as pd
    import ray

    from unfurl_ray.ops.relational import cume_dist_by

    rng = np.random.default_rng(21)
    df = pd.DataFrame(
        {
            "id": np.arange(500, dtype=np.int64),
            "k": rng.integers(0, 4, 500),
            "v": rng.integers(0, 40, 500).astype(np.float64),
        }
    )
    out = cume_dist_by(
        ray.data.from_pandas(df).repartition(4), "k", "v"
    ).to_pandas()
    want = df.groupby("k")["v"].rank(method="max", pct=True)
    merged = out.merge(
        df.assign(want=want), on=["id", "k", "v"]
    )
    # cd is round(·, 6); compare the same rounding of the reference
    assert np.allclose(
        merged["cd"], np.round(merged["want"], 6), atol=1e-12
    )


def test_label_propagation_matches_reference(ray_session):
    """Distributed sync-LPA equals the driver-side reference rule on
    a random graph (two planted cliques + noise edges)."""
    import pandas as pd
    import ray

    from unfurl_ray.ops.graph import (
        label_propagation, label_propagation_reference,
    )

    rng = np.random.default_rng(17)
    edges = set()
    for base in (0, 20):  # two 10-cliques
        for i in range(10):
            for j in range(i + 1, 10):
                edges.add((base + i, base + j))
    for _ in range(15):  # noise
        a, b = sorted(rng.integers(0, 40, 2).tolist())
        if a != b:
            edges.add((a, b))
    df = pd.DataFrame(sorted(edges), columns=["a", "b"])
    got = label_propagation(
        ray.data.from_pandas(df).repartition(3),
        max_iters=10, num_partitions=4,
    ).to_pandas()
    want = label_propagation_reference(df, max_iters=10)
    got_map = dict(zip(got["node"].astype(int),
                       got["community"].astype(int)))
    assert got_map == want
    # the two planted cliques resolve to single communities
    assert len({want[n] for n in range(10)}) == 1


def test_trimmed_mean_by_drops_outliers(ray_session):
    import pandas as pd
    import ray

    from unfurl_ray.ops.relational import trimmed_mean_by

    v = np.concatenate([[1e9], np.full(18, 5.0), [-1e9]])
    df = pd.DataFrame(
        {"id": np.arange(20, dtype=np.int64), "k": 1, "v": v}
    )
    out = trimmed_mean_by(
        ray.data.from_pandas(df).repartition(3),
        key_col="k", value_col="v", id_col="id", trim=0.1,
    ).to_pandas()
    assert out["n_kept"].iloc[0] == 16
    assert abs(out["trimmed_mean"].iloc[0] - 5.0) < 1e-12


def test_first_last_by_candidates_survive_blocks(ray_session):
    """first/last must be exact regardless of block boundaries —
    compare against a single-partition pandas reference."""
    import pandas as pd
    import ray

    from unfurl_ray.ops.relational import first_last_by

    rng = np.random.default_rng(31)
    n = 600
    df = pd.DataFrame(
        {
            "id": rng.permutation(n).astype(np.int64),
            "k": rng.integers(0, 9, n),
            "ts": pd.to_datetime(
                rng.integers(0, 10**6, n), unit="s"
            ).astype("datetime64[us]"),
            "v": rng.normal(0, 1, n),
        }
    )
    out = first_last_by(
        ray.data.from_pandas(df).repartition(7),
        key_col="k", ts_col="ts", id_col="id", value_col="v",
    ).to_pandas().sort_values("k").reset_index(drop=True)
    for _, row in out.iterrows():
        g = df[df["k"] == row["k"]].sort_values(["ts", "id"])
        assert row["first_value"] == g["v"].iloc[0]
        assert row["last_value"] == g["v"].iloc[-1]
        assert row["first_ts"] == g["ts"].astype("int64").iloc[0]
        assert row["last_ts"] == g["ts"].astype("int64").iloc[-1]


def test_compress_ratio_orders_redundancy(ray_session):
    import pandas as pd
    import pyarrow as pa

    from unfurl_ray.ops.textstats import compress_ratio_batch

    rep = "spam ham " * 200
    rng = np.random.default_rng(41)
    noise = "".join(
        chr(c) for c in rng.integers(33, 126, len(rep))
    )
    t = pa.table({"doc_id": [0, 1], "text": [rep, noise]})
    out = compress_ratio_batch(t).to_pandas()
    assert out.loc[0, "ratio"] < 0.1        # boilerplate crushes
    assert out.loc[1, "ratio"] > 0.7        # noise barely compresses
    # determinism
    out2 = compress_ratio_batch(t).to_pandas()
    pd.testing.assert_frame_equal(out, out2)


def test_hash_negatives_no_self_and_in_range(ray_session):
    import pandas as pd
    import ray

    from unfurl_ray.ops.textstats import hash_negatives

    df = pd.DataFrame({"doc_id": np.arange(50, dtype=np.int64)})
    out = hash_negatives(
        ray.data.from_pandas(df).repartition(4), k=3
    ).to_pandas()
    assert len(out) == 150
    assert (out["neg_id"] != out["doc_id"]).all()
    assert out["neg_id"].between(0, 49).all()


def test_markov_stationary_eigen_identity(ray_session):
    """pi is stationary: pi P = pi for the row-normalized transition
    matrix built from the same counts."""
    from unfurl_ray.pipelines import q_markov_stationary

    out = q_markov_stationary("/root/testdata/sf0.001")
    pi = out["stationary"].to_numpy(np.float64)
    assert abs(pi.sum() - 1.0) < 1e-5
    assert (pi > 0).all()


def test_naive_bayes_apply_unseen_value_uses_smoothed_logp(ray_session):
    """A feature value absent from the model contributes the smoothed
    zero-count conditional ln(a) - ln(class_n + a*nv), NOT 0.0 — an
    unseen value must never outscore a seen one (all real logps are
    negative), and mixed seen/unseen rows argmax like a brute-force
    NB scorer."""
    import pandas as pd
    import ray

    from unfurl_ray.ops.fit import naive_bayes_apply, naive_bayes_fit

    train = pd.DataFrame(
        {
            "cls": ["a"] * 6 + ["b"] * 4,
            "f1": ["x", "x", "x", "x", "y", "y", "y", "y", "y", "x"],
            "f2": ["p", "p", "q", "p", "p", "q", "q", "q", "q", "p"],
        }
    )
    model = naive_bayes_fit(
        ray.data.from_pandas(train).repartition(2), "cls", ["f1", "f2"]
    )

    test = pd.DataFrame(
        {
            "f1": ["x", "UNSEEN", "x", "UNSEEN"],
            "f2": ["p", "q", "UNSEEN", "UNSEEN"],
        }
    )
    got = (
        naive_bayes_apply(
            ray.data.from_pandas(test), model, ["f1", "f2"]
        )
        .to_pandas()["predicted"]
        .tolist()
    )

    # brute-force expected scores with alpha=1 smoothing
    classes = sorted(train["cls"].unique())
    class_n = train["cls"].value_counts()
    prior = {c: np.log(class_n[c] / len(train)) for c in classes}
    want = []
    for _, row in test.iterrows():
        scores = {}
        for c in classes:
            s = prior[c]
            for f in ("f1", "f2"):
                nv = train[f].nunique()
                cnt = (
                    (train["cls"] == c) & (train[f] == row[f])
                ).sum()
                s += np.log(cnt + 1.0) - np.log(class_n[c] + nv)
            scores[c] = s
        want.append(max(sorted(scores), key=lambda c: scores[c]))
    assert got == want


def test_weighted_quantile_fractional_weights(ray_session):
    """Non-integral weights: the owner-block pick must agree with a
    driver-side exact scan even when float block subtotals and the
    in-block cumsum disagree in the last ulp (the overflow falls
    through to the next block instead of clamping)."""
    import pandas as pd
    import ray

    from unfurl_ray.ops.relational import weighted_quantile

    rng = np.random.default_rng(99)
    v = rng.permutation(np.arange(600)).astype(np.float64)
    w = rng.uniform(0.1, 1.0, 600) * 0.1  # non-integral, sum ~ 33
    df = pd.DataFrame({"v": v, "w": w})
    ds = ray.data.from_pandas(df).repartition(16)

    h = df.sort_values("v")
    cw = h["w"].cumsum().to_numpy()
    tot = float(cw[-1])
    for q in (0.25, 0.5, 0.75, 0.999, 1.0):
        got = weighted_quantile(ds, "v", "w", q=q)
        i = int(np.searchsorted(cw, q * tot))
        i = min(i, len(cw) - 1)
        # accept the exact index or its ulp-neighbour, but the
        # invariant is hard: cum_weight >= target minus one ulp
        want_vals = {float(h["v"].iloc[i])}
        if i + 1 < len(cw):
            want_vals.add(float(h["v"].iloc[i + 1]))
        assert got["value"] in want_vals, q
        assert got["cum_weight"] >= q * tot - 1e-9 * tot, q


def test_degree_assortativity_regular_graph_is_nan(ray_session):
    """Every node the same degree -> zero variance -> correlation
    undefined: NaN, matching the SQL twin's NULL divide."""
    import pandas as pd
    import ray

    from unfurl_ray.ops.graph import degree_assortativity

    # a 4-cycle: every node has degree 2
    e = pd.DataFrame({"a": [0, 1, 2, 3], "b": [1, 2, 3, 0]})
    out = degree_assortativity(ray.data.from_pandas(e).repartition(2))
    assert np.isnan(out["assortativity"].iloc[0])


def test_ecdf_normalize_empty_reference_raises(ray_session):
    import pandas as pd
    import ray

    from unfurl_ray.ops.profile import ecdf_normalize

    q_ds = ray.data.from_pandas(pd.DataFrame({"x": [1.0, 2.0]}))
    ref = ray.data.from_pandas(
        pd.DataFrame({"v": pd.Series([], dtype="float64")})
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="empty"):
        ecdf_normalize(q_ds, "x", ref, "v")


def test_cell_scan_family_hot_key(ray_session):
    """The eight de-skewed per-key ordered-stream ops match a pandas
    per-key reference when ONE key holds >50% of the stream and spans
    many (key, time-bucket) cells — no one-key-per-group assumption
    anywhere (the keyed_cell_scan contract)."""
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.relational import (
        lag_rolling,
        late_event_split,
        rolling_median_by,
        throttle_events,
        time_weighted_avg,
    )

    rng = np.random.default_rng(11)
    n_hot, n_cold = 6000, 4000
    n = n_hot + n_cold
    span_us = 20 * 86_400_000_000
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "k": np.concatenate(
                [
                    np.zeros(n_hot, dtype=np.int64),
                    rng.integers(1, 40, n_cold),
                ]
            ),
            "ts": pd.to_datetime(
                rng.integers(0, span_us, n), unit="us"
            ),
            "v": rng.uniform(-5, 5, n).round(3),
        }
    )
    ds = rd.from_pandas(df).repartition(8)
    # small buckets force the hot key across ~480 cells, so tail
    # carries are exercised on every cell boundary
    kw = dict(key_col="k", ts_col="ts", value_col="v", id_col="id",
              bucket_s=3600)

    ref = df.copy()
    ref["ts_us"] = ref["ts"].astype("int64") // 1000
    ref = ref.sort_values(["k", "ts_us", "id"])
    g = ref.groupby("k")

    # lag_rolling
    got = (
        lag_rolling(ds, roll_n=3, **kw)
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    ref["delta_us"] = g["ts_us"].diff().fillna(-1).astype(np.int64)
    ref["roll_max"] = g["v"].transform(
        lambda s: s.rolling(3, min_periods=1).max()
    )
    r = ref.sort_values("id").reset_index(drop=True)
    assert (got["delta_us"].to_numpy() == r["delta_us"].to_numpy()).all()
    assert np.allclose(got["roll_max"].to_numpy(), r["roll_max"].to_numpy())

    # rolling_median_by
    got = (
        rolling_median_by(
            ds, key_col="k", ts_col="ts", id_col="id",
            value_col="v", window=5,
        )
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    med = g["v"].transform(
        lambda s: s.rolling(5, min_periods=1).median()
    )
    assert np.allclose(
        got["roll_median"].to_numpy(),
        ref.assign(m=med).sort_values("id")["m"].to_numpy(),
    )

    # throttle_events (30-minute gap)
    got = (
        throttle_events(
            ds, key_col="k", ts_col="ts", id_col="id",
            min_gap_us=1_800_000_000,
        )
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    keep = g["ts_us"].diff().fillna(np.inf) >= 1_800_000_000
    want = ref[keep].sort_values("id")
    assert (got["id"].to_numpy() == want["id"].to_numpy()).all()

    # time_weighted_avg
    got = (
        time_weighted_avg(
            ds, key_col="k", ts_col="ts", value_col="v", id_col="id"
        )
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    rows = []
    for k, sub in ref.groupby("k"):
        ts = sub["ts_us"].to_numpy()
        dt = np.diff(ts)
        if len(dt) == 0 or dt.sum() == 0:
            continue
        rows.append(
            (k, float(np.sum(sub["v"].to_numpy()[:-1] * dt)
                      / dt.sum()), int(dt.sum()), len(dt))
        )
    want = pd.DataFrame(
        rows, columns=["k", "twap", "span_us", "n_intervals"]
    )
    assert (got["k"].to_numpy() == want["k"].to_numpy()).all()
    assert np.allclose(got["twap"].to_numpy(), want["twap"].to_numpy())
    assert (got["span_us"].to_numpy() == want["span_us"].to_numpy()).all()

    # late_event_split: arrival order = id, tiny id buckets so the
    # hot key's stream spans ~160 arrival cells
    got = (
        late_event_split(
            ds, key_col="k", ts_col="ts", id_col="id",
            allowed_lateness_us=6 * 3_600_000_000, id_bucket_bits=6,
        )
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    ref2 = df.copy()
    ref2["ts_us"] = ref2["ts"].astype("int64") // 1000
    ref2 = ref2.sort_values(["k", "id"])
    run_max = ref2.groupby("k")["ts_us"].cummax()
    prev_max = run_max.groupby(ref2["k"]).shift(1)
    late = (
        ref2["ts_us"] < prev_max - 6 * 3_600_000_000
    ).fillna(False).astype(np.int64)
    want = ref2.assign(late=late).sort_values("id")
    assert (got["late"].to_numpy() == want["late"].to_numpy()).all()


def test_attribution_and_trims_hot_key(ray_session):
    """last_touch_attribution, trimmed_mean_by and resample_linear
    match pandas references under a planted hot key (>50% of rows),
    including cells that contain ONLY target rows (the
    presence-marker carry path)."""
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.relational import (
        last_touch_attribution,
        resample_linear,
        trimmed_mean_by,
    )

    rng = np.random.default_rng(7)
    n_hot, n_cold = 6000, 4000
    n = n_hot + n_cold
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "k": np.concatenate(
                [
                    np.zeros(n_hot, dtype=np.int64),
                    rng.integers(1, 40, n_cold),
                ]
            ),
            "ty": rng.choice(
                ["view", "click", "buy"], n, p=[0.4, 0.2, 0.4]
            ),
        }
    )
    # with 64-id cells and p(buy)=0.4, pure-target cells exist
    ds = rd.from_pandas(df).repartition(8)
    got = (
        last_touch_attribution(
            ds, key_col="k", id_col="id", type_col="ty",
            target="buy", id_bucket_bits=6,
        )
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    ref = df.sort_values(["k", "id"])
    touch = (
        ref["ty"].where(ref["ty"] != "buy")
        .groupby(ref["k"]).ffill()
    )
    want = ref.assign(touch=touch)
    want = want[(want["ty"] == "buy") & want["touch"].notna()]
    want = want.sort_values("id").reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["id"].to_numpy() == want["id"].to_numpy()).all()
    assert (got["touch"].to_numpy() == want["touch"].to_numpy()).all()

    # trimmed_mean_by on skewed values with heavy ties
    vdf = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "k": df["k"],
            "v": rng.choice([1.0, 2.0, 2.0, 3.0, 10.0], n),
        }
    )
    got = (
        trimmed_mean_by(
            rd.from_pandas(vdf).repartition(8), key_col="k",
            value_col="v", id_col="id", trim=0.1,
        )
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    rows = []
    for k, sub in vdf.sort_values(["v", "id"]).groupby("k"):
        v = sub["v"].to_numpy()
        nn = len(v)
        kk = int(np.floor(0.1 * nn))
        kept = v[kk: nn - kk]
        rows.append((k, kept.sum() / len(kept), len(kept), nn))
    want = pd.DataFrame(
        rows, columns=["k", "trimmed_mean", "n_kept", "n"]
    ).sort_values("k").reset_index(drop=True)
    assert (got["k"].to_numpy() == want["k"].to_numpy()).all()
    assert np.allclose(
        got["trimmed_mean"].to_numpy(), want["trimmed_mean"].to_numpy()
    )
    assert (got["n_kept"].to_numpy() == want["n_kept"].to_numpy()).all()

    # resample_linear: hot key's 6000 events collapse to <=30 units
    tdf = pd.DataFrame(
        {
            "k": df["k"],
            "ts": pd.to_datetime(
                rng.integers(0, 30 * 86_400_000_000, n), unit="us"
            ),
            "v": rng.uniform(0, 100, n).round(2),
        }
    )
    got = (
        resample_linear(
            rd.from_pandas(tdf).repartition(8), key_col="k",
            ts_col="ts", value_col="v", bucket_s=86_400,
        )
        .to_pandas().sort_values(["k", "unit"]).reset_index(drop=True)
    )
    ref = tdf.copy()
    ref["u"] = ref["ts"].astype("int64") // 1000 // 86_400_000_000
    rows = []
    for k, sub in ref.groupby("k"):
        daily = sub.groupby("u")["v"].agg(["sum", "count"])
        u = daily.index.to_numpy(np.int64)
        v = (daily["sum"] / daily["count"]).to_numpy(np.float64)
        grid = np.arange(u[0], u[-1] + 1, dtype=np.int64)
        prev = np.searchsorted(u, grid, side="right") - 1
        obs = u[prev] == grid
        pt, pv = u[prev], v[prev]
        nxt = np.minimum(prev + 1, len(u) - 1)
        nt, nv = u[nxt], v[nxt]
        with np.errstate(invalid="ignore", divide="ignore"):
            interp = pv + (nv - pv) * (grid - pt) / (nt - pt)
        out_v = np.where(obs, pv, interp)
        for uu, vv, oo in zip(grid, out_v, obs):
            rows.append((k, uu, vv, int(oo)))
    want = pd.DataFrame(
        rows, columns=["k", "unit", "v", "observed"]
    ).sort_values(["k", "unit"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["unit"].to_numpy() == want["unit"].to_numpy()).all()
    assert np.allclose(got["v"].to_numpy(), want["v"].to_numpy())
    assert (
        got["observed"].to_numpy() == want["observed"].to_numpy()
    ).all()


def _encode_png(px: "np.ndarray", filters=None, level: int = 6) -> bytes:
    """Minimal PNG encoder for tests: 8-bit gray/RGB(A), chosen
    per-row filter types (forward-filtered so the decoder's inverse
    is exercised)."""
    import struct
    import zlib

    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    filters = filters or [0] * h
    prev = np.zeros(w * ch, np.int64)
    raw = bytearray()
    for y, f in zip(range(h), filters):
        line = px[y].reshape(-1).astype(np.int64)
        if f == 0:
            enc = line
        elif f == 1:
            left = np.concatenate([np.zeros(ch, np.int64), line[:-ch]])
            enc = (line - left) % 256
        elif f == 2:
            enc = (line - prev) % 256
        elif f == 3:
            left = np.concatenate([np.zeros(ch, np.int64), line[:-ch]])
            enc = (line - (left + prev) // 2) % 256
        else:  # paeth
            enc = np.empty(w * ch, np.int64)
            for x in range(w * ch):
                a = line[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                da, db, dc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (da <= db and da <= dc) else (
                    b if db <= dc else c
                )
                enc[x] = (line[x] - pred) % 256
        raw.append(f)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = line

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload)) + typ + payload
            + struct.pack(">I", zlib.crc32(typ + payload))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), level))
        + chunk(b"IEND", b"")
    )


def _encode_bmp(px: "np.ndarray") -> bytes:
    """Minimal 24-bit bottom-up BMP encoder for tests."""
    import struct

    h, w, _ = px.shape
    rowsz = (w * 3 + 3) // 4 * 4
    body = bytearray()
    for y in range(h - 1, -1, -1):
        row = px[y][:, ::-1].astype(np.uint8).tobytes()
        body.extend(row)
        body.extend(b"\x00" * (rowsz - len(row)))
    hdr = b"BM" + struct.pack(
        "<IHHI", 54 + len(body), 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return hdr + bytes(body)


def test_png_bmp_decode_roundtrip():
    """decode_png inverts every filter type (0/1/2/3/4) for gray, RGB
    and RGBA; decode_bmp inverts the 24-bit bottom-up layout; both
    agree on the same pixels."""
    from unfurl_ray.ops.multimodal import decode_bmp, decode_image, decode_png

    rng = np.random.default_rng(5)
    for ch in (1, 3, 4):
        px = rng.integers(0, 256, (11, 7, ch)).astype(np.uint8)
        for filters in ([0] * 11, [1] * 11, [2] * 11, [3] * 11,
                        [4] * 11, [0, 1, 2, 3, 4, 0, 1, 2, 3, 4, 2]):
            got = decode_png(_encode_png(px, filters=filters))
            want = px[:, :, 0] if ch == 1 else px
            assert got.shape == want.shape
            assert (got == want).all(), (ch, filters)
    rgb = rng.integers(0, 256, (9, 5, 3)).astype(np.uint8)
    got = decode_bmp(_encode_bmp(rgb))
    assert (got == rgb).all()
    assert (decode_image(_encode_png(rgb)) == decode_image(
        _encode_bmp(rgb)
    )).all()
    assert decode_png(b"not a png") is None
    assert decode_bmp(b"XXnot a bmp") is None


def test_phash_real_pixels_invariance():
    """pHash on the REAL pixel path: re-encodings of the same pixels
    (PNG filter choice, compression level, PNG vs BMP) hash
    identically, and a visually different image differs — a byte
    fingerprint could not do either."""
    import pyarrow as pa

    from unfurl_ray.ops.multimodal import DecodeBackend, ImagePHash

    rng = np.random.default_rng(6)
    px = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    other = px.copy()
    other[:16] = 255 - other[:16]
    variants = [
        _encode_png(px, level=1),
        _encode_png(px, level=9),
        _encode_png(px, filters=[2] * 32),
        _encode_bmp(px),
    ]
    t = pa.table(
        {
            "doc_id": pa.array(
                list(range(len(variants) + 1)), pa.int64()
            ),
            "content": pa.array(
                variants + [_encode_png(other)], pa.binary()
            ),
        }
    )
    out = ImagePHash()(t)
    hashes = out.column("phash").to_pylist()
    assert len(set(hashes[: len(variants)])) == 1, hashes
    assert hashes[-1] != hashes[0]
    # non-image payloads keep the deterministic fingerprint fallback
    f = DecodeBackend().features(b"just some text bytes", dim=64)
    assert f.shape == (64,)


def test_image_resize_real_pixels(ray_session):
    """ImageResize nearest-neighbor on natively decoded PNG pixels:
    output bytes have the requested geometry and exact corner pixels."""
    import pyarrow as pa
    import ray.data as rd

    from unfurl_ray.ops.multimodal import ImageResize

    rng = np.random.default_rng(8)
    px = rng.integers(0, 256, (16, 12, 3)).astype(np.uint8)
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1], pa.int64()),
                "content": pa.array([_encode_png(px)], pa.binary()),
            }
        )
    )
    out = ds.map_batches(
        ImageResize,
        fn_constructor_kwargs={"width": 4, "height": 4},
        batch_format="pyarrow", batch_size=1, concurrency=1,
    ).take_all()
    blob = out[0]["resized"]
    arr = np.frombuffer(blob, np.uint8).reshape(4, 4, 3)
    ridx = (np.arange(4) * 16) // 4
    cidx = (np.arange(4) * 12) // 4
    assert (arr == px[ridx][:, cidx]).all()


def test_local_clustering_matches_brute(ray_session):
    """Per-node clustering coefficients from the wedge machinery
    equal the brute adjacency computation 2*diag(A^3)/(d(d-1)) on a
    random graph with a hub node."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.graph import local_clustering

    rng = np.random.default_rng(23)
    n = 50
    A = (rng.uniform(size=(n, n)) < 0.15).astype(np.int64)
    A[0, :] = A[:, 0] = 1  # hub
    np.fill_diagonal(A, 0)
    A = np.triu(A, 1)
    A = A + A.T
    iu = np.column_stack(np.nonzero(np.triu(A, 1)))
    edges = pd.DataFrame(
        {"a": iu[:, 0].astype(np.int64), "b": iu[:, 1].astype(np.int64)}
    )
    got = local_clustering(
        rd.from_pandas(edges).repartition(4), n_buckets=8
    )
    tri = np.diag(A @ A @ A) // 2
    d = A.sum(axis=1)
    present = d > 0
    want_t = tri[present]
    want_d = d[present]
    with np.errstate(divide="ignore", invalid="ignore"):
        want_c = np.where(
            want_d >= 2,
            2.0 * want_t / (want_d * (want_d - 1.0)),
            0.0,
        )
    got = got.sort_values("node").reset_index(drop=True)
    assert got["node"].tolist() == list(np.nonzero(present)[0])
    assert got["t"].tolist() == want_t.tolist()
    assert got["d"].tolist() == want_d.tolist()
    assert np.allclose(got["coeff"].to_numpy(), np.round(want_c, 6))


def test_sssp_matches_dijkstra(ray_session):
    """Distributed Bellman-Ford distances equal a reference Dijkstra
    on a random weighted digraph, including parallel edges (min
    weight wins) and unreachable nodes (absent from the output)."""
    import heapq

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from unfurl_ray.ops.graph import sssp

    rng = np.random.default_rng(7)
    n, m = 40, 400
    u = rng.integers(0, n, m).astype(np.int64)
    v = rng.integers(0, n, m).astype(np.int64)
    keep = u != v
    u, v = u[keep], v[keep]
    w = rng.integers(1, 100, len(u)).astype(np.int64)
    edges = pd.DataFrame({"u": u, "v": v, "w": w})
    seeds = [0, 1]
    got = sssp(
        rd.from_pandas(edges).repartition(4), seeds,
        num_partitions=4,
    )

    adj: dict[int, list[tuple[int, int]]] = {}
    for a, b, ww in zip(u, v, w):
        adj.setdefault(int(a), []).append((int(b), int(ww)))
    dist = {s: 0 for s in seeds}
    pq = [(0, s) for s in seeds]
    heapq.heapify(pq)
    while pq:
        d, x = heapq.heappop(pq)
        if d > dist.get(x, 1 << 62):
            continue
        for y, ww in adj.get(x, []):
            nd = d + ww
            if nd < dist.get(y, 1 << 62):
                dist[y] = nd
                heapq.heappush(pq, (nd, y))
    want = pd.DataFrame(
        sorted(dist.items()), columns=["node", "dist"]
    ).astype("int64")
    # nodes with no edges at all never enter the shard layout; the
    # reference may contain isolated seeds only if they had out-edges
    present = set(np.concatenate([u, v]).tolist())
    want = want[want["node"].isin(present)].reset_index(drop=True)
    got = got.reset_index(drop=True)
    assert got["node"].tolist() == want["node"].tolist()
    assert got["dist"].tolist() == want["dist"].tolist()


def test_interval_overlap_join_matches_brute(ray_session):
    """interval_overlap_join vs an O(n^2) in-memory reference on a
    mixed workload: multi-cell-spanning intervals, touching (non-
    overlapping) endpoints, and ONE hot key holding >50% of all
    intervals spread across many blocks."""
    import ray.data as rd

    from unfurl_ray.ops.relational import interval_overlap_join

    rng = np.random.default_rng(7)
    W = 1_000_000  # 1 s cells

    def mk(n, hot_frac):
        key = np.where(
            rng.random(n) < hot_frac, 7, rng.integers(0, 40, n)
        )
        s = rng.integers(0, 50 * W, n)
        dur = rng.integers(1, 5 * W, n)
        return pd.DataFrame(
            {"k": key.astype(np.int64), "s": s, "e": s + dur}
        )

    lf = mk(400, 0.55)
    rf = mk(300, 0.55)
    # planted touching pair: must NOT join (half-open intervals)
    lf.loc[0] = [99, 10 * W, 11 * W]
    rf.loc[0] = [99, 11 * W, 12 * W]

    got = (
        interval_overlap_join(
            rd.from_pandas(lf).repartition(8),
            rd.from_pandas(rf).repartition(8),
            "k", "s", "e", cell_us=W,
        )
        .to_pandas()
        .sort_values(["k", "s_l", "s_r", "e_l", "e_r"])
        .reset_index(drop=True)
    )

    brute = lf.merge(rf, on="k", suffixes=("_l", "_r"))
    brute = brute[
        (brute["s_l"] < brute["e_r"]) & (brute["s_r"] < brute["e_l"])
    ][["k", "s_l", "e_l", "s_r", "e_r"]].sort_values(
        ["k", "s_l", "s_r", "e_l", "e_r"]
    ).reset_index(drop=True)

    assert len(got) == len(brute) > 0
    pd.testing.assert_frame_equal(
        got.astype("int64"), brute.astype("int64")
    )
    assert not ((got["k"] == 99)).any()  # touching pair excluded


def test_hits_matches_dense_power_iteration(ray_session):
    """Shard-actor HITS vs dense numpy on a random directed graph
    (including dangling and source-only nodes)."""
    import ray.data as rd

    from unfurl_ray.ops.graph import hits

    rng = np.random.default_rng(11)
    n, m = 60, 400
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    edges = pd.DataFrame({"src": src, "dst": dst}).drop_duplicates()

    got = (
        hits(
            rd.from_pandas(edges).repartition(4),
            n_iter=30, n_buckets=4, dedup_edges=True,
        )
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )

    # dense reference, Kleinberg normalization per half-step
    A = np.zeros((n, n))
    A[edges["src"].to_numpy(), edges["dst"].to_numpy()] = 1.0
    h = np.ones(n)
    for _ in range(30):
        a = A.T @ h
        a /= np.linalg.norm(a) or 1.0
        h = A @ a
        h /= np.linalg.norm(h) or 1.0

    nodes = got["node"].to_numpy()
    np.testing.assert_allclose(
        got["hub"].to_numpy(), h[nodes], atol=1e-9
    )
    np.testing.assert_allclose(
        got["authority"].to_numpy(), a[nodes], atol=1e-9
    )


def test_personalized_pagerank_matches_dense(ray_session):
    """Shard-actor PPR vs dense numpy random-walk-with-restart on a
    random directed graph with dangling nodes."""
    import ray.data as rd

    from unfurl_ray.ops.graph import personalized_pagerank

    rng = np.random.default_rng(13)
    n, m = 50, 300
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    keep = src != dst
    edges = pd.DataFrame(
        {"src": src[keep], "dst": dst[keep]}
    ).drop_duplicates()
    seeds = [0, 7, 13]

    got = (
        personalized_pagerank(
            rd.from_pandas(edges).repartition(4),
            seeds, n_iter=40, n_buckets=4, dedup_edges=True,
        )
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )

    # dense reference: column-stochastic walk, teleport+dangling to
    # the seed distribution
    A = np.zeros((n, n))
    A[edges["src"].to_numpy(), edges["dst"].to_numpy()] = 1.0
    deg = A.sum(axis=1)
    s = np.zeros(n)
    s[seeds] = 1.0 / len(seeds)
    r = s.copy()
    d = 0.85
    for _ in range(40):
        w = np.where(deg > 0, r / np.maximum(deg, 1), 0.0)
        c = A.T @ w
        dangling = r[deg == 0].sum()
        r = d * c + ((1 - d) + d * dangling) * s

    nodes = got["node"].to_numpy()
    np.testing.assert_allclose(
        got["rank"].to_numpy(), r[nodes], atol=1e-9
    )
    # mass conservation
    assert abs(got["rank"].sum() - 1.0) < 1e-6


def test_gmm_matches_inmemory_em(ray_session):
    """Distributed GMM-EM vs an identical-init numpy EM, plus
    log-likelihood monotonicity."""
    import ray.data as rd

    from unfurl_ray.ops.fit import gmm_fit

    rng = np.random.default_rng(5)
    x = np.concatenate(
        [rng.normal(0, 1, 400), rng.normal(6, 0.5, 200)]
    )
    df = pd.DataFrame({"x": x})
    params, hist = gmm_fit(
        rd.from_pandas(df).repartition(6), "x", k=2, iters=20
    )

    # identical deterministic init
    n = len(x)
    mean, var = x.mean(), x.var()
    mu = mean + np.sqrt(var) * np.linspace(-1.0, 1.0, 2)
    vr = np.full(2, var)
    w = np.full(2, 0.5)
    for _ in range(20):
        logp = (
            -0.5 * ((x[:, None] - mu) ** 2 / vr
                    + np.log(2 * np.pi * vr))
            + np.log(w)
        )
        m = logp.max(axis=1, keepdims=True)
        p = np.exp(logp - m)
        r = p / p.sum(axis=1, keepdims=True)
        R = r.sum(axis=0)
        w = R / n
        mu = (r * x[:, None]).sum(axis=0) / R
        vr = (r * x[:, None] ** 2).sum(axis=0) / R - mu**2

    got = params.sort_values("mean")
    order = np.argsort(mu)
    np.testing.assert_allclose(
        got["mean"].to_numpy(), mu[order], atol=1e-6
    )
    np.testing.assert_allclose(
        got["weight"].to_numpy(), w[order], atol=1e-6
    )
    np.testing.assert_allclose(
        got["var"].to_numpy(), vr[order], atol=1e-6
    )
    # EM guarantees nondecreasing log-likelihood
    assert all(
        b >= a - 1e-7 for a, b in zip(hist, hist[1:])
    )
    # the two planted modes were found
    assert abs(got["mean"].iloc[0] - 0.0) < 0.3
    assert abs(got["mean"].iloc[1] - 6.0) < 0.3
