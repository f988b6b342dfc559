"""Training-export operators (pipeline/export.py): leakage-safety of the
split, determinism/density of the shuffle permutation, and on-disk shard
order from write_shards."""

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from interference_spark.pipeline import export

SF_DIR_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR_SMALL}/documents.parquet")


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_DIR_SMALL}/events.parquet")


def test_split_is_leakage_safe_and_complete(events):
    s = export.assign_split(
        events, "user_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    per_user = s.groupBy("user_id").agg(
        F.countDistinct("split").alias("n_splits")
    )
    assert per_user.filter("n_splits <> 1").count() == 0  # no unit straddles
    assert s.filter("split IS NULL").count() == 0
    # rough proportions (hash buckets, not exact): train should dominate
    counts = {r["split"]: r["n"] for r in s.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert counts["train"] > counts.get("val", 0) + counts.get("test", 0)


def test_split_fraction_validation(events):
    with pytest.raises(ValueError):
        export.assign_split(events, "user_id", {"train": 0.8, "val": 0.1})


def test_split_stable_under_repartition(events):
    a = export.assign_split(events, "user_id", {"a": 0.5, "b": 0.5})
    b = export.assign_split(
        events.repartition(7), "user_id", {"a": 0.5, "b": 0.5}
    )
    assert sorted(
        (r["event_id"], r["split"]) for r in a.select("event_id", "split").collect()
    ) == sorted(
        (r["event_id"], r["split"]) for r in b.select("event_id", "split").collect()
    )


def test_shards_dense_and_deterministic(docs):
    s = export.shuffled_shards(docs, "doc_id", 4)
    stats = s.groupBy("shard").agg(
        F.count("*").alias("n"),
        F.min("shuffle_pos").alias("mn"),
        F.max("shuffle_pos").alias("mx"),
        F.countDistinct("shuffle_pos").alias("d"),
    )
    for r in stats.collect():
        assert r["mn"] == 0 and r["mx"] == r["n"] - 1 and r["d"] == r["n"]
    assert stats.count() == 4
    # deterministic: same permutation twice
    s2 = export.shuffled_shards(docs.repartition(5), "doc_id", 4)
    key = lambda df: sorted(
        (r["doc_id"], r["shard"], r["shuffle_pos"])
        for r in df.select("doc_id", "shard", "shuffle_pos").collect()
    )
    assert key(s) == key(s2)


def test_mix64_mixer_works(docs):
    s = export.shuffled_shards(docs, "doc_id", 4, mixer=export.mix64)
    assert s.filter("shard < 0 OR shard >= 4").count() == 0


def test_write_shards_files_are_in_shuffle_order(docs, spark, tmp_path):
    out = str(tmp_path / "shards")
    export.write_shards(docs, "doc_id", 4, out)
    expected = {
        (r["shard"], r["shuffle_pos"]): r["doc_id"]
        for r in export.shuffled_shards(docs, "doc_id", 4)
        .select("shard", "shuffle_pos", "doc_id")
        .collect()
    }
    seen = 0
    for shard in range(4):
        files = sorted(glob.glob(f"{out}/shard={shard}/*.parquet"))
        assert files, f"no files for shard {shard}"
        pos_stream = []
        for f in files:
            t = pq.read_table(f, columns=["shuffle_pos", "doc_id"])
            pos_stream += list(
                zip(t["shuffle_pos"].to_pylist(), t["doc_id"].to_pylist())
            )
        # physical row order within the shard == shuffle order
        assert pos_stream == sorted(pos_stream)
        for pos, did in pos_stream:
            assert expected[(shard, pos)] == did
            seen += 1
    assert seen == docs.count()


def test_pack_sequences_layout_invariants(docs, spark):
    """Packing invariants: per-shard offsets are contiguous (each doc
    starts where the previous ended), packs are the budget-chunks of the
    concatenated stream, and the layout is partitioning-independent."""
    from pyspark.sql import functions as F

    d = docs.withColumn(
        "tok", F.size(F.split(F.trim(F.col("text")), r"\s+"))
    ).filter(F.length(F.trim(F.col("text"))) > 0)
    p = export.pack_sequences(d, "doc_id", "tok", budget=512, n_shards=3)
    rows = sorted(
        (
            (r["shard"], r["pack_offset"], r["tok"], r["pack"], r["doc_id"])
            for r in p.select(
                "shard", "pack_offset", "tok", "pack", "doc_id"
            ).collect()
        )
    )
    by_shard = {}
    for sh, off, tok, pack, did in rows:
        by_shard.setdefault(sh, []).append((off, tok, pack, did))
    assert len(by_shard) == 3
    for sh, seq in by_shard.items():
        expect_off = 0
        for off, tok, pack, _ in seq:
            assert off == expect_off  # contiguous concatenated stream
            assert pack == off // 512  # budget-chunk of the start token
            expect_off = off + tok
    # partitioning-independent: same layout after a repartition
    p2 = export.pack_sequences(
        d.repartition(7), "doc_id", "tok", budget=512, n_shards=3
    )
    rows2 = sorted(
        (r["shard"], r["pack_offset"], r["tok"], r["pack"], r["doc_id"])
        for r in p2.select(
            "shard", "pack_offset", "tok", "pack", "doc_id"
        ).collect()
    )
    assert rows == rows2


def test_stratified_sample_nested_property(docs, spark):
    """Raising a stratum's rate must only ADD units, never swap them."""
    low = {
        r["doc_id"]
        for r in export.stratified_sample(
            docs, "lang", {"en": 0.2}, "doc_id", default_rate=0.1
        ).collect()
    }
    high = {
        r["doc_id"]
        for r in export.stratified_sample(
            docs, "lang", {"en": 0.6}, "doc_id", default_rate=0.1
        ).collect()
    }
    assert low <= high
    import pytest as _pytest

    with _pytest.raises(ValueError):
        export.stratified_sample(docs, "lang", {"en": 1.5}, "doc_id")


def test_write_jsonl_shards_layout_and_order(docs, spark, tmp_path):
    """JSONL export: same deterministic shard layout as parquet, physical
    line order == shuffle order, content round-trips through json."""
    import json

    out = str(tmp_path / "jshards")
    export.write_jsonl_shards(docs, "doc_id", 4, out)
    expected = {
        (r["shard"], r["shuffle_pos"]): r["doc_id"]
        for r in export.shuffled_shards(docs, "doc_id", 4)
        .select("shard", "shuffle_pos", "doc_id")
        .collect()
    }
    seen = 0
    for shard in range(4):
        files = sorted(glob.glob(f"{out}/shard={shard}/*.json"))
        assert files, f"no files for shard {shard}"
        stream = []
        for f in files:
            with open(f) as fh:
                for line in fh:
                    rec = json.loads(line)
                    stream.append((rec["shuffle_pos"], rec["doc_id"]))
        assert stream == sorted(stream)
        for pos, did in stream:
            assert expected[(shard, pos)] == did
            seen += 1
    assert seen == docs.count()


def test_weighted_sample_nested_and_proportional(docs, spark):
    """Nested-sample property (smaller scale ⊂ larger scale) and keep rate
    roughly proportional to weight."""
    from pyspark.sql import functions as F

    w = F.lit(0.5)
    half = {r["doc_id"] for r in export.weighted_sample(docs, "doc_id", w, 0.5).collect()}
    full = {r["doc_id"] for r in export.weighted_sample(docs, "doc_id", w, 1.0).collect()}
    assert half <= full  # nested
    n = docs.count()
    assert abs(len(half) / n - 0.25) < 0.08
    assert abs(len(full) / n - 0.5) < 0.08
    # weight > 1/scale keeps everything
    assert export.weighted_sample(docs, "doc_id", F.lit(2.0)).count() == n


def test_temperature_sample_nested_and_flattening(spark):
    """Raising the budget only ADDS rows (nested-sample property), and the
    α=0.5 rebalance flattens head strata: the head stratum's keep
    probability is strictly below the tail stratum's."""
    from pyspark.sql import functions as F

    from interference_spark.pipeline.export import (
        temperature_rates,
        temperature_sample,
    )

    rows = [(i, "head" if i < 900 else "tail") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    small = {
        r["doc_id"]
        for r in temperature_sample(df, "lang", "doc_id", 0.3).collect()
    }
    big = {
        r["doc_id"]
        for r in temperature_sample(df, "lang", "doc_id", 0.6).collect()
    }
    assert small <= big, "raising the budget must never drop kept rows"
    rates = {
        r["lang"]: r["p_keep"]
        for r in temperature_rates(df, "lang", 0.5).collect()
    }
    assert rates["head"] < rates["tail"], "head stratum must be downweighted"
    # output shares move toward sqrt proportions: head share in the kept
    # set must drop below its 90% corpus share
    kept = temperature_sample(df, "lang", "doc_id", 0.5)
    shares = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert shares["head"] / sum(shares.values()) < 0.9


def test_tar_shards_roundtrip_and_determinism(spark, tmp_path):
    """WebDataset-style tar export: every row lands exactly once across
    shards with its json + bin members in shuffle order; a second export
    is byte-identical (zeroed tar metadata + deterministic permutation)."""
    import glob
    import hashlib
    import io
    import json
    import tarfile

    from interference_spark.pipeline.export import (
        read_tar_shards,
        write_tar_shards,
    )

    df = spark.createDataFrame(
        [(i, f"doc {i}", bytes([i % 251]) * (i + 1)) for i in range(40)],
        "doc_id long, text string, payload binary",
    )
    out1, out2 = str(tmp_path / "t1"), str(tmp_path / "t2")
    write_tar_shards(df, "doc_id", 4, out1, content_col="payload")
    write_tar_shards(df, "doc_id", 4, out2, content_col="payload")
    h = lambda p: hashlib.md5(open(p, "rb").read()).hexdigest()
    d1 = {p.split("/")[-1]: h(p) for p in glob.glob(out1 + "/*.tar")}
    d2 = {p.split("/")[-1]: h(p) for p in glob.glob(out2 + "/*.tar")}
    assert d1 == d2 and len(d1) == 4, "export must be byte-reproducible"

    # every row exactly once, members paired, payload intact
    seen = {}
    for p in sorted(glob.glob(out1 + "/*.tar")):
        with tarfile.open(p) as tf:
            names = tf.getnames()
            metas = [n for n in names if n.endswith(".json")]
            bins = [n for n in names if n.endswith(".bin")]
            assert {m[:-5] for m in metas} == {b[:-4] for b in bins}
            for m in metas:
                doc = json.loads(tf.extractfile(m).read())
                seen[doc["doc_id"]] = True
    assert sorted(seen) == list(range(40))

    # reader round-trip: same members, payload bytes intact
    back = read_tar_shards(spark, out1)
    rows = back.collect()
    assert len(rows) == 80  # 40 json + 40 bin
    payloads = {
        int(r["member_name"][:-4]): bytes(r["content"])
        for r in rows
        if r["member_name"].endswith(".bin")
    }
    assert payloads[7] == bytes([7]) * 8
