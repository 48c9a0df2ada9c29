"""Tests for input connectors (CoNLL, embeddings, generic) and fan-out."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from saber_spark.fixtures.dictionary import surface_label_map
from saber_spark.operators.fanout import fanout_mentions, harmonize_entities
from saber_spark.operators.vocab import vocab_ids
from saber_spark.sources.conll import (
    load_conll_dir,
    load_conll_file,
    pool_compound_vocab,
    replace_rare_tokens,
)
from saber_spark.sources.embeddings import (
    build_embedding_matrix,
    filter_to_vocab,
    load_word2vec_text,
)
from saber_spark.sources.registry import read_table

# mirrors the reference fixtures' shape
# (saber/tests/resources/dummy_dataset_1/train.tsv: BIOES DISO tags)
CONLL_TRAIN = """Human\tO
APC2\tO
maps\tO
to\tO
chromosome\tO
19p13\tO
.\tO

The\tO
absence\tB-DISO
of\tI-DISO
functional\tI-DISO
C7\tE-DISO
activity\tO
.\tO
"""

CONLL_VALID = """Single\tO
sentence\tB-PRGE
.\tO
"""

W2V_TEXT = """4 3
the 0.1 0.2 0.3
absence 1.0 2.0 3.0
maps -1.0 0.5 0.25
zzz 9.0 9.0 9.0
"""


@pytest.fixture(scope="module")
def conll_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("conll")
    (d / "train.tsv").write_text(CONLL_TRAIN)
    (d / "valid.tsv").write_text(CONLL_VALID)
    return str(d)


class TestConll:
    def test_load_file(self, spark, conll_dir):
        df = load_conll_file(spark, f"{conll_dir}/train.tsv")
        rows = {r["sent_id"]: r for r in df.collect()}
        assert len(rows) == 2
        assert rows[0]["tokens"] == ["Human", "APC2", "maps", "to",
                                     "chromosome", "19p13", "."]
        assert rows[1]["tags"] == ["O", "B-DISO", "I-DISO", "I-DISO",
                                   "E-DISO", "O", "O"]
        assert rows[0]["partition"] == "train"

    def test_load_dir_partitions(self, spark, conll_dir):
        df = load_conll_dir(spark, conll_dir)
        parts = {r["partition"] for r in df.collect()}
        assert parts == {"train", "valid"}
        assert df.count() == 3

    def test_bad_filename_raises(self, spark, tmp_path):
        (tmp_path / "bogus.tsv").write_text("a\tO\n")
        with pytest.raises(ValueError):
            load_conll_dir(spark, str(tmp_path))

    def test_pool_compound_vocab(self, spark, conll_dir):
        train = load_conll_file(spark, f"{conll_dir}/train.tsv")
        valid = load_conll_file(spark, f"{conll_dir}/valid.tsv", "valid")
        pooled = {r["token"] for r in
                  pool_compound_vocab([train, valid]).collect()}
        assert "Human" in pooled and "Single" in pooled
        assert len(pooled) == len({t for r in (train.collect() + valid.collect())
                                   for t in r["tokens"]})

    def test_replace_rare(self, spark):
        df = spark.createDataFrame(
            [("d", "train", 0, ["x", "x", "y"], ["O", "O", "O"]),
             ("d", "train", 1, ["x", "z"], ["O", "O"])],
            "doc_id string, partition string, sent_id int, "
            "tokens array<string>, tags array<string>")
        out = {r["sent_id"]: r["tokens"]
               for r in replace_rare_tokens(df, count=1).collect()}
        assert out[0] == ["x", "x", "<UNK>"]
        assert out[1] == ["x", "<UNK>"]

    def test_replace_rare_keeps_empty_and_dup_rows(self, spark):
        # Empty token arrays survive (posexplode drops them mid-plan) and
        # duplicate sentence rows keep their multiplicity.
        df = spark.createDataFrame(
            [("d", "train", 0, [], []),
             ("d", "train", 1, ["x", "q"], ["O", "O"]),
             ("d", "train", 1, ["x", "q"], ["O", "O"])],
            "doc_id string, partition string, sent_id int, "
            "tokens array<string>, tags array<string>")
        rows = replace_rare_tokens(df, count=1).collect()
        assert len(rows) == 3
        by_tokens = sorted(tuple(r["tokens"]) for r in rows)
        # "x" appears twice corpus-wide -> kept; "q" twice -> kept too
        assert by_tokens == [(), ("x", "q"), ("x", "q")]

    def test_replace_rare_large_vocab_bounded_plan(self, spark):
        # 50k distinct once-occurring tokens: the former implementation
        # collected them into a plan-literal array (multi-MB plan + linear
        # scan per token). The join formulation must keep the plan O(1)
        # in |vocab| and still replace everything.
        df = spark.range(5000).select(
            F.col("id").alias("sent_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(9)),
                lambda i: F.concat(F.lit("tok_"),
                                   (F.col("id") * 10 + i).cast("string"))
            ).alias("tokens"))
        out = replace_rare_tokens(df, count=1)
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert len(plan) < 100_000, f"plan blew up: {len(plan)} chars"
        agg = out.select(
            F.sum(F.size(F.filter("tokens",
                                  lambda t: t == "<UNK>"))).alias("n_unk"),
            F.sum(F.size("tokens")).alias("n_tot")).collect()[0]
        assert agg["n_unk"] == agg["n_tot"] == 50_000


class TestEmbeddings:
    @pytest.fixture(scope="class")
    def w2v_path(self, tmp_path_factory):
        p = tmp_path_factory.mktemp("emb") / "w2v.txt"
        p.write_text(W2V_TEXT)
        return str(p)

    def test_load(self, spark, w2v_path):
        df = load_word2vec_text(spark, w2v_path)
        rows = {r["word"]: r["vector"] for r in df.collect()}
        assert len(rows) == 4  # header line dropped
        assert rows["absence"] == [1.0, 2.0, 3.0]

    def test_matrix_with_vocab_filter(self, spark, w2v_path):
        docs = spark.createDataFrame(
            [(0, "the absence maps")], "doc_id long, text string")
        from saber_spark.operators.vocab import tokenize_docs
        vocab = vocab_ids(tokenize_docs(docs))
        emb = filter_to_vocab(load_word2vec_text(spark, w2v_path), vocab)
        assert emb.count() == 3  # zzz filtered out (not in corpus)
        matrix = build_embedding_matrix(emb, vocab)
        ids = {r["token"]: r["token_id"] for r in vocab.collect()}
        assert matrix.shape == (2 + len(ids) - 0, 3) or matrix.shape[1] == 3
        np.testing.assert_allclose(matrix[ids["absence"]], [1.0, 2.0, 3.0])
        # PAD/UNK rows stay zero (saber/embeddings.py:97-106 parity)
        assert not matrix[0].any() and not matrix[1].any()

    def test_debug_cap(self, spark, w2v_path):
        assert load_word2vec_text(spark, w2v_path, debug=True).count() <= 10000


class TestRegistry:
    def test_parquet_and_csv(self, spark, tmp_path):
        df = spark.createDataFrame([(1, "a")], "id long, s string")
        df.write.parquet(str(tmp_path / "t.parquet"))
        df.write.option("header", "true").csv(str(tmp_path / "t.csv"))
        assert read_table(spark, str(tmp_path / "t.parquet")).count() == 1
        got = read_table(spark, str(tmp_path / "t.csv"), fmt="csv").collect()
        assert got[0]["s"] == "a"

    def test_bad_format(self, spark):
        with pytest.raises(ValueError):
            read_table(spark, "/nope", fmt="avro")


class TestFanout:
    def test_harmonize(self):
        assert harmonize_entities(
            {"PRGE": False, "DISO": False}, {"PRGE": True, "XXX": True}
        ) == {"PRGE": True, "DISO": False}

    def test_fanout_superset_of_single_pass(self, spark):
        """K per-type models unioned ⊇ one multi-type model.

        Reference semantics: each model tags independently and
        combine_annotations concatenates, so mentions that a multi-type
        greedy pass consumes into a longer cross-type surface (here
        'fast table'/CHED swallowing 'table'/PRGE) REAPPEAR from the
        single-type model — overlapping ents coexist
        (saber/utils/app_utils.py:165-178)."""
        full_map = surface_label_map()
        per_type = {}
        for key, label in full_map.items():
            per_type.setdefault(label, {})[key] = label
        extracted = spark.createDataFrame(
            [("u1", "spark causes slow sort . customer stream big data ."),
             ("u2", "vector table fast table merge .")],
            "url string, doc_text string")
        from saber_spark.operators.tagger import detect_mentions
        bc = spark.sparkContext.broadcast(full_map)
        single = {tuple(r) for r in detect_mentions(extracted, bc).collect()}
        fan = {tuple(r) for r in
               fanout_mentions(extracted, per_type).collect()}
        assert single <= fan
        extra = fan - single
        # every extra mention overlaps a longer mention of another type
        assert extra == {("u2", 0, 3, 4, 18, 23, "table", "PRGE")}

    def test_fanout_subset(self, spark):
        full_map = surface_label_map()
        per_type = {}
        for key, label in full_map.items():
            per_type.setdefault(label, {})[key] = label
        extracted = spark.createDataFrame(
            [("u1", "spark slow sort customer .")],
            "url string, doc_text string")
        only_prge = fanout_mentions(
            extracted, per_type,
            requested={"PRGE": True, "DISO": False, "CHED": False,
                       "LIVB": False})
        labels = {r["label"] for r in only_prge.collect()}
        assert labels == {"PRGE"}


class TestRegistrySinks:
    """write_table / merge_upsert: the format seam every sink goes through."""

    def test_write_table_roundtrip_with_partitioning(self, spark, tmp_path):
        from saber_spark.sources.registry import read_table, write_table
        df = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "a", 30)],
            "id long, grp string, v long")
        path = str(tmp_path / "t")
        write_table(df, path, partition_by=["grp"])
        back = read_table(spark, path)
        assert {tuple(r) for r in back.select("id", "grp", "v").collect()} \
            == {(1, "a", 10), (2, "b", 20), (3, "a", 30)}
        assert (tmp_path / "t" / "grp=a").exists()

    def test_merge_upsert_sums_and_mins(self, spark, tmp_path):
        from saber_spark.sources.registry import merge_upsert, read_table
        path = str(tmp_path / "edges")
        schema = "subj string, pred string, obj string, n long, first string"
        base = spark.createDataFrame(
            [("a", "p", "b", 2, "url9"), ("a", "p", "c", 1, "url5")], schema)
        # first merge into a non-existent target just writes the updates
        merge_upsert(path, base, keys=["subj", "pred", "obj"],
                     sum_cols=["n"], min_cols=["first"], epoch_id=0)
        upd = spark.createDataFrame(
            [("a", "p", "b", 3, "url1"), ("x", "p", "y", 1, "url2")], schema)
        merge_upsert(path, upd, keys=["subj", "pred", "obj"],
                     sum_cols=["n"], min_cols=["first"], epoch_id=1)
        got = {(r["subj"], r["obj"]): (r["n"], r["first"])
               for r in read_table(spark, path).collect()}
        assert got == {("a", "b"): (5, "url1"),   # matched: sum + min
                       ("a", "c"): (1, "url5"),   # untouched
                       ("x", "y"): (1, "url2")}   # not matched: insert

    def test_unsupported_format_rejected(self, spark):
        from saber_spark.sources.registry import write_table
        df = spark.range(1)
        with pytest.raises(ValueError, match="Unsupported format"):
            write_table(df, "/tmp/nope", fmt="avro")


class TestMergeUpsertContract:
    def test_first_write_aggregates_duplicate_keys(self, spark, tmp_path):
        """A batch carrying several rows for one key must land aggregated
        even when the target does not exist yet (MERGE key contract)."""
        from saber_spark.sources.registry import merge_upsert, read_table
        path = str(tmp_path / "t")
        upd = spark.createDataFrame(
            [("a", "p", "b", 2, "u9"), ("a", "p", "b", 3, "u1")],
            "subj string, pred string, obj string, n long, first string")
        merge_upsert(path, upd, keys=["subj", "pred", "obj"],
                     sum_cols=["n"], min_cols=["first"], epoch_id=0)
        rows = read_table(spark, path).collect()
        assert len(rows) == 1
        assert rows[0]["n"] == 5 and rows[0]["first"] == "u1"

    def test_replayed_epoch_is_noop(self, spark, tmp_path):
        """A micro-batch replayed after a completed swap (crash before the
        streaming checkpoint commit) must not re-sum counts."""
        from saber_spark.sources.registry import merge_upsert, read_table
        path = str(tmp_path / "t")
        schema = "subj string, pred string, obj string, n long, first string"
        b0 = spark.createDataFrame([("a", "p", "b", 2, "u9")], schema)
        b1 = spark.createDataFrame([("a", "p", "b", 3, "u1")], schema)
        kw = dict(keys=["subj", "pred", "obj"],
                  sum_cols=["n"], min_cols=["first"])
        merge_upsert(path, b0, epoch_id=0, **kw)
        merge_upsert(path, b1, epoch_id=1, **kw)
        # replay both epochs out of a rewound checkpoint: no-ops
        merge_upsert(path, b0, epoch_id=0, **kw)
        merge_upsert(path, b1, epoch_id=1, **kw)
        rows = read_table(spark, path).collect()
        assert len(rows) == 1 and rows[0]["n"] == 5
        # marker file is invisible to the parquet scan but present on disk
        assert (tmp_path / "t" / "_applied_epoch").read_text() == "1"

    def test_crash_window_recovery(self, spark, tmp_path):
        """Simulate each crash window of the rename-aside swap: the next
        merge_upsert call must recover without losing accumulated counts."""
        import shutil as sh

        from saber_spark.sources.registry import merge_upsert, read_table
        path = str(tmp_path / "t")
        schema = "subj string, pred string, obj string, n long, first string"
        kw = dict(keys=["subj", "pred", "obj"],
                  sum_cols=["n"], min_cols=["first"])
        b0 = spark.createDataFrame([("a", "p", "b", 2, "u9")], schema)
        merge_upsert(path, b0, epoch_id=0, **kw)

        # window 1: died between rename-aside and swap-in — target gone,
        # __prev holds the authoritative table
        sh.move(path, path + "__prev")
        b1 = spark.createDataFrame([("a", "p", "b", 3, "u1")], schema)
        merge_upsert(path, b1, epoch_id=1, **kw)
        assert read_table(spark, path).collect()[0]["n"] == 5

        # window 2: died after swap-in, before dropping the aside copy —
        # stale __prev next to a live table must be discarded, not merged
        sh.copytree(path, path + "__prev")
        b2 = spark.createDataFrame([("a", "p", "b", 1, "u0")], schema)
        merge_upsert(path, b2, epoch_id=2, **kw)
        assert read_table(spark, path).collect()[0]["n"] == 6
        assert not (tmp_path / "t__prev").exists()

    def test_epoch_none_always_applies(self, spark, tmp_path):
        from saber_spark.sources.registry import merge_upsert, read_table
        path = str(tmp_path / "t")
        schema = "subj string, pred string, obj string, n long, first string"
        b = spark.createDataFrame([("a", "p", "b", 1, "u1")], schema)
        kw = dict(keys=["subj", "pred", "obj"],
                  sum_cols=["n"], min_cols=["first"])
        merge_upsert(path, b, **kw)
        merge_upsert(path, b, **kw)  # batch semantics: no epoch, re-applies
        assert read_table(spark, path).collect()[0]["n"] == 2


class TestWriters:
    def test_conll_roundtrip(self, spark, tmp_path):
        """write_conll_file output must load back identically through
        load_conll_file — the reference-toolchain interchange contract."""
        from saber_spark.sources.conll import (load_conll_file,
                                               write_conll_file)
        df = spark.createDataFrame(
            [("train.tsv", "train", 0, ["Human", "APC2", "."],
              ["O", "B-PRGE", "O"]),
             ("train.tsv", "train", 1, ["Single", "cell"],
              ["O", "O"])],
            "doc_id string, partition string, sent_id int, "
            "tokens array<string>, tags array<string>")
        path = str(tmp_path / "train.tsv")
        write_conll_file(df, path)
        assert open(path).read() == (
            "Human\tO\nAPC2\tB-PRGE\n.\tO\n\nSingle\tO\ncell\tO\n")
        back = load_conll_file(spark, path)
        got = {(r["sent_id"]): (r["tokens"], r["tags"])
               for r in back.collect()}
        assert got[0] == (["Human", "APC2", "."], ["O", "B-PRGE", "O"])
        assert got[1] == (["Single", "cell"], ["O", "O"])

    def test_conll_empty_raises(self, spark, tmp_path):
        from saber_spark.sources.conll import write_conll_file
        empty = spark.createDataFrame(
            [], "doc_id string, partition string, sent_id int, "
                "tokens array<string>, tags array<string>")
        with pytest.raises(ValueError, match="empty"):
            write_conll_file(empty, str(tmp_path / "x.tsv"))

    def test_word2vec_roundtrip(self, spark, tmp_path):
        from saber_spark.sources.embeddings import (load_word2vec_text,
                                                    write_word2vec_text)
        df = spark.createDataFrame(
            [("cell", [0.5, -1.25, 3.0]), ("human", [1.0, 2.0, -0.125])],
            "word string, vector array<float>")
        path = str(tmp_path / "w2v.txt")
        write_word2vec_text(df, path)
        first = open(path).readline().strip()
        assert first == "2 3"
        back = {r["word"]: r["vector"]
                for r in load_word2vec_text(spark, path).collect()}
        assert back["cell"] == [0.5, -1.25, 3.0]
        assert back["human"] == [1.0, 2.0, -0.125]

    def test_conll_rejects_ragged_and_empty_rows(self, spark, tmp_path):
        from saber_spark.sources.conll import write_conll_file
        schema = ("doc_id string, partition string, sent_id int, "
                  "tokens array<string>, tags array<string>")
        ragged = spark.createDataFrame(
            [("d", "train", 0, ["A", "B", "C"], ["O", "O"])], schema)
        with pytest.raises(ValueError, match="size"):
            write_conll_file(ragged, str(tmp_path / "r.tsv"))
        with_empty = spark.createDataFrame(
            [("d", "train", 0, ["A"], ["O"]),
             ("d", "train", 1, [], [])], schema)
        with pytest.raises(ValueError, match="empty tokens"):
            write_conll_file(with_empty, str(tmp_path / "e.tsv"))

    def test_word2vec_rejects_malformed(self, spark, tmp_path):
        from saber_spark.sources.embeddings import write_word2vec_text
        p = str(tmp_path / "w.txt")
        bad_word = spark.createDataFrame(
            [("new york", [1.0, 2.0])], "word string, vector array<float>")
        with pytest.raises(ValueError, match="whitespace"):
            write_word2vec_text(bad_word, p)
        null_comp = spark.createDataFrame(
            [("a", [1.0, None, 3.0])], "word string, vector array<float>")
        with pytest.raises(ValueError, match="null components"):
            write_word2vec_text(null_comp, p)
        ragged = spark.createDataFrame(
            [("a", [1.0, 2.0]), ("b", [1.0, 2.0, 3.0])],
            "word string, vector array<float>")
        with pytest.raises(ValueError, match="ragged"):
            write_word2vec_text(ragged, p)
        dim1 = spark.createDataFrame(
            [("a", [1.0])], "word string, vector array<float>")
        with pytest.raises(ValueError, match="dim"):
            write_word2vec_text(dim1, p)


class TestJsonlCorpus:
    def test_malformed_lines_quarantined_not_dropped(self, spark, tmp_path):
        """PERMISSIVE JSONL ingest: broken lines land verbatim in
        _corrupt_record (parsed cols NULL); valid rows parse with NULL
        there. Nothing is dropped, nothing raises."""
        from saber_spark.sources.registry import read_jsonl_corpus
        p = str(tmp_path / "corpus.jsonl")
        lines = ['{"doc_id": 1, "text": "alpha beta"}',
                 '{"doc_id": 2, "text": "gamma"}',
                 '{broken json!!',
                 '{"doc_id": "not_a_number", "text": "delta"}']
        with open(p, "w") as fh:
            fh.write("\n".join(lines) + "\n")
        df = read_jsonl_corpus(spark, p, "doc_id BIGINT, text STRING")
        rows = df.collect()
        assert len(rows) == 4
        clean = [r for r in rows if r["_corrupt_record"] is None]
        bad = [r for r in rows if r["_corrupt_record"] is not None]
        assert sorted(r["doc_id"] for r in clean) == [1, 2]
        assert len(bad) == 2  # syntax error + type mismatch both quarantined
        assert "{broken json!!" in {r["_corrupt_record"] for r in bad}
        # the type-mismatch line keeps its parseable columns
        mism = [r for r in bad if r["_corrupt_record"] != "{broken json!!"][0]
        assert mism["text"] == "delta" and mism["doc_id"] is None


class TestCompaction:
    def test_compacts_files_preserving_rows_and_epoch_marker(self, spark,
                                                             tmp_path):
        """32 small files -> target_files parquet parts with identical
        rows; the merge sink's _applied_epoch replay marker survives so
        exactly-once semantics hold across compactions."""
        import os

        from saber_spark.sources.registry import compact_table, read_table
        p = str(tmp_path / "sink")
        spark.range(1000).repartition(32).write.parquet(p)
        with open(os.path.join(p, "_applied_epoch"), "w") as fh:
            fh.write("7")
        before = set(r["id"] for r in read_table(spark, p).collect())
        n_before = len([f for f in os.listdir(p) if f.endswith(".parquet")])
        assert n_before >= 30

        compact_table(spark, p, target_files=4)

        after = set(r["id"] for r in read_table(spark, p).collect())
        assert after == before
        n_after = len([f for f in os.listdir(p) if f.endswith(".parquet")])
        assert n_after <= 4
        with open(os.path.join(p, "_applied_epoch")) as fh:
            assert fh.read().strip() == "7"
        assert not os.path.exists(p + "__prev")
        assert not os.path.exists(p + "__compact")

    def test_recovers_interrupted_swap_before_compacting(self, spark,
                                                         tmp_path):
        """A table left renamed aside by a crashed merge (mid-swap) is
        restored before compaction reads it."""
        import os
        import shutil as sh

        from saber_spark.sources.registry import compact_table, read_table
        p = str(tmp_path / "sink")
        spark.range(100).repartition(8).write.parquet(p)
        sh.move(p, p + "__prev")  # simulate death between the two moves
        assert not os.path.exists(p)
        compact_table(spark, p, target_files=2)
        assert read_table(spark, p).count() == 100

    def test_compacts_csv_rewrites_header(self, spark, tmp_path):
        """csv compaction must write header=true to match read_table's
        read default — otherwise the next read eats a data row as the
        header (round-4 review finding)."""
        from saber_spark.sources.registry import (compact_table, read_table,
                                                  write_table)
        p = str(tmp_path / "csvsink")
        df = spark.createDataFrame(
            [(i, f"t{i}") for i in range(50)], "doc_id int, text string")
        write_table(df.repartition(8), p, "csv", header="true")
        compact_table(spark, p, target_files=2, fmt="csv")
        back = read_table(spark, p, "csv",
                          schema="doc_id int, text string")
        rows = {(r["doc_id"], r["text"]) for r in back.collect()}
        assert rows == {(i, f"t{i}") for i in range(50)}

    def test_compacts_partitioned_table_preserves_layout(self, spark,
                                                         tmp_path):
        """Default partition_by=None auto-detects Hive partition dirs and
        re-applies them; string partition values like '01' round-trip
        byte-exact (no dtype re-inference)."""
        import os

        from saber_spark.sources.registry import compact_table, write_table
        p = str(tmp_path / "part_sink")
        df = spark.createDataFrame(
            [(i, "01" if i % 2 else "02") for i in range(40)],
            "doc_id int, source string")
        write_table(df.repartition(8), p, "parquet",
                    partition_by=["source"])
        compact_table(spark, p, target_files=2)
        subs = sorted(d for d in os.listdir(p) if d.startswith("source="))
        assert subs == ["source=01", "source=02"]
        back = spark.read.parquet(p)
        assert back.filter("source = '01'").count() == 20
        assert back.filter("source = '02'").count() == 20

    def test_compacts_checkpoint_stage_preserves_manifest(self, spark,
                                                          tmp_path):
        """Compacting a checkpointed stage keeps _saber_manifest.json, so
        resume (is_complete) and lineage_report still see the stage."""
        from saber_spark.checkpoint import is_complete, write_stage
        from saber_spark.sources.registry import compact_table
        ck = tmp_path / "ck"
        p = str(ck / "stage_a")
        write_stage(spark.range(100).repartition(8), p, "stage_a")
        assert is_complete(p, "stage_a")
        compact_table(spark, p, target_files=2)
        assert is_complete(p, "stage_a")
        assert spark.read.parquet(p).count() == 100


class TestLineageReportScale:
    def test_lineage_report_handles_rows_past_int32(self, spark, tmp_path):
        """Manifests from trillion-row stages carry counts > 2^31-1; the
        report schema must be BIGINT (round-4 review finding)."""
        import json
        import os

        from saber_spark.checkpoint import MANIFEST_NAME, lineage_report
        ck = tmp_path / "ck"
        stage_dir = ck / "big_stage"
        os.makedirs(stage_dir)
        manifest = {
            "stage": "big_stage", "complete": True,
            "rows": 3_000_000_000,
            "partitions": {"0": 2_500_000_000, "1": 500_000_000},
            "write_seconds": 1.0, "metrics": {}, "config": None,
        }
        with open(stage_dir / MANIFEST_NAME, "w") as fh:
            json.dump(manifest, fh)
        rep = lineage_report(spark, str(ck)).collect()
        assert {r["rows"] for r in rep} == {2_500_000_000, 500_000_000}
        assert all(r["stage_rows"] == 3_000_000_000 for r in rep)
