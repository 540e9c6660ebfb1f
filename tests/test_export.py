"""JSONL training export (sources/export.py)."""

from __future__ import annotations

import glob
import json

from pyspark.sql import functions as F

from tripwire_spark.sources.export import export_jsonl, read_jsonl


def _docs(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text "), F.col("id")).alias("text"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )


def test_round_trip(spark, tmp_path):
    p = str(tmp_path / "corpus")
    export_jsonl(_docs(spark), p, id_col="doc_id", shards=4)
    back = read_jsonl(spark, p, "doc_id long, text string, lang string")
    assert back.count() == 200
    assert sorted(r.doc_id for r in back.collect()) == list(range(200))
    # every line is valid standalone JSON
    files = glob.glob(p + "/part-*")
    assert files
    with open(files[0]) as fh:
        row = json.loads(fh.readline())
    assert set(row) == {"doc_id", "text", "lang"}


def test_shuffled_export_is_deterministic(spark, tmp_path):
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    d = _docs(spark)
    export_jsonl(d, p1, id_col="doc_id", shards=4)
    export_jsonl(d.repartition(13), p2, id_col="doc_id", shards=4)

    def slurp(p):
        out = []
        for f in sorted(glob.glob(p + "/part-*")):
            with open(f) as fh:
                out.append(fh.read())
        return out

    # same doc ids -> byte-identical shard contents, whatever the input
    # partitioning was (reproducible corpus, the training requirement)
    assert slurp(p1) == slurp(p2)
    # and genuinely shuffled: shard-order doc ids differ from insert order
    ids = [json.loads(line)["doc_id"] for line in slurp(p1)[0].splitlines()]
    assert ids != sorted(ids)


def test_partitioned_export(spark, tmp_path):
    p = str(tmp_path / "split")
    from tripwire_spark.operators.packing import split_corpus

    d = split_corpus(_docs(spark), {"train": 0.8, "val": 0.2}, "doc_id")
    export_jsonl(d, p, columns=["doc_id", "text"], id_col="doc_id", partition_by=["split"])
    dirs = {x.rsplit("/", 1)[-1] for x in glob.glob(p + "/split=*")}
    assert dirs == {"split=train", "split=val"}
    back = read_jsonl(spark, p, "doc_id long, text string, split string")
    assert back.count() == 200
