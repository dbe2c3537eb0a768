"""Chunking + sequence packing: chunk contents against a DuckDB list-slicing
oracle; packing invariants (full assignment, capacity, determinism)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from oni_ml_spark.datapipe.chunking import chunk_documents, pack_sequences
from oni_ml_spark.io import load_table

SF_DIR = "/root/testdata/sf0.001"


class TestChunking:
    def test_chunks_match_duckdb_oracle(self, spark):
        docs = load_table(spark, SF_DIR, "documents")
        got = sorted(
            map(tuple, chunk_documents(docs, "doc_id", "text", chunk_tokens=16,
                                       overlap=4).collect())
        )
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
        want = sorted(con.execute("""
          WITH toks AS (
            SELECT doc_id AS id,
              list_filter(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
                          t -> t != '') AS tk
            FROM documents),
          idx AS (
            SELECT id, tk, unnest(range(0, greatest(CAST(ceil((len(tk) - 4) / 12.0) AS BIGINT), 1))) AS chunk_no
            FROM toks WHERE len(tk) > 0)
          SELECT id, chunk_no,
                 array_to_string(tk[chunk_no * 12 + 1 : chunk_no * 12 + 16], ' ') AS chunk_text,
                 len(tk[chunk_no * 12 + 1 : chunk_no * 12 + 16]) AS n_tokens
          FROM idx
        """).fetchall())
        assert [tuple(map(str, r)) for r in got] == [tuple(map(str, r)) for r in want]
        assert len(got) > 500  # docs actually split into multiple chunks

    def test_overlap_and_edges(self, spark):
        df = spark.createDataFrame([(1, "a b c d e"), (2, ""), (3, "x")],
                                   "doc_id long, text string")
        rows = chunk_documents(df, "doc_id", "text", chunk_tokens=3, overlap=1)
        by = {}
        for r in rows.collect():
            by.setdefault(r["id"], []).append((r["chunk_no"], r["chunk_text"]))
        assert sorted(by[1]) == [(0, "a b c"), (1, "c d e")]
        assert 2 not in by                      # empty doc -> no chunks
        assert by[3] == [(0, "x")]              # short doc -> single chunk
        with pytest.raises(ValueError):
            chunk_documents(df, "doc_id", "text", chunk_tokens=3, overlap=3)


class TestPacking:
    def test_full_assignment_capacity_and_determinism(self, spark):
        docs = load_table(spark, SF_DIR, "documents")
        capacity = 256
        a = pack_sequences(docs, "doc_id", "text", capacity=capacity)
        b = pack_sequences(docs, "doc_id", "text", capacity=capacity)
        rows = a.collect()
        assert sorted(r["id"] for r in rows) == sorted(
            r["doc_id"] for r in docs.collect()
        )  # every doc assigned exactly once
        totals = {}
        for r in rows:
            totals[r["bin_id"]] = totals.get(r["bin_id"], 0) + r["n_tokens"]
        for bid, tot in totals.items():
            members = [r for r in rows if r["bin_id"] == bid]
            assert tot <= capacity or len(members) == 1, (bid, tot)
        # deterministic across runs
        assert sorted(map(tuple, rows)) == sorted(map(tuple, b.collect()))
        # packing actually packs: far fewer bins than docs
        assert len(totals) < len(rows) / 2

    def test_precomputed_count_column_matches_retokenizing(self, spark):
        """r12: pack_sequences(n_tokens_col=...) must assign every chunk to
        the SAME bin as the re-tokenizing path — the precomputed count is
        the optimization, not a semantic knob."""
        from oni_ml_spark.datapipe.chunking import chunk_documents

        docs = load_table(spark, SF_DIR, "documents")
        chunks = chunk_documents(docs, "doc_id", "text", chunk_tokens=64, overlap=8)
        from pyspark.sql import functions as F

        chunks = chunks.withColumn(
            "cid",
            F.concat_ws("_", F.col("id").cast("string"), F.col("chunk_no").cast("string")),
        )
        a = pack_sequences(chunks, "cid", "chunk_text", capacity=256)
        b = pack_sequences(
            chunks, "cid", "chunk_text", capacity=256, n_tokens_col="n_tokens"
        )
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_oversized_doc_gets_own_bin(self, spark):
        df = spark.createDataFrame(
            [(1, " ".join(["w"] * 50)), (2, "a b"), (3, "c d")],
            "doc_id long, text string",
        )
        rows = pack_sequences(df, "doc_id", "text", capacity=10)
        bins = {r["id"]: r["bin_id"] for r in rows.collect()}
        assert bins[1] not in (bins[2], bins[3])  # oversized doc isolated


class TestPretokenizedChunking:
    def test_bpe_pieces_chunk_by_real_token_budget(self, spark):
        """The tokenizer-faithful composition: BPE pieces -> windowed chunks
        counted in PIECES (whitespace counting would under-budget)."""
        from oni_ml_spark.datapipe.bpe import apply_bpe, train_bpe_merges
        from oni_ml_spark.datapipe.chunking import chunk_token_arrays

        df = spark.createDataFrame(
            [(0, "low lower lowest " * 20), (1, "newest widest")],
            "doc_id long, text string",
        )
        merges = train_bpe_merges(df, "text", num_merges=20)
        toks = apply_bpe(df, "doc_id", "text", merges)
        chunks = chunk_token_arrays(toks, "doc_id", "bpe_tokens", chunk_tokens=16, overlap=4)
        rows = chunks.collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["id"], []).append(r)
        # full coverage: stride reassembly reproduces each doc's piece stream
        piece_streams = {r["doc_id"]: r["bpe_tokens"] for r in toks.collect()}
        for i, stream in piece_streams.items():
            got = []
            for r in sorted(by_doc[i], key=lambda r: r["chunk_no"]):
                got.extend(r["tokens"] if r["chunk_no"] == 0 else r["tokens"][4:])
            assert got == list(stream), i
        assert all(r["n_tokens"] <= 16 for r in rows)

    def test_wrapper_equals_direct_text_chunking(self, spark):
        """chunk_documents (the text wrapper) must be unchanged by the
        shared-core refactor: same rows as chunking the token arrays."""
        from oni_ml_spark.datapipe.chunking import chunk_documents, chunk_token_arrays
        from oni_ml_spark.datapipe.dedup import tokens
        from oni_ml_spark.io import load_table

        d = load_table(spark, "/root/testdata/sf0.001", "documents")
        a = sorted(
            (r["id"], r["chunk_no"], r["chunk_text"], r["n_tokens"])
            for r in chunk_documents(d, "doc_id", "text", 16, 4).collect()
        )
        pre = d.select(F.col("doc_id"), tokens("text").alias("t"))
        b = sorted(
            (r["id"], r["chunk_no"], " ".join(r["tokens"]), r["n_tokens"])
            for r in chunk_token_arrays(pre, "doc_id", "t", 16, 4).collect()
        )
        assert a == b


class TestFirstFitTree:
    def test_identical_to_linear_first_fit_reference(self):
        """The segment-tree first-fit (r05, O(log bins)/doc) must produce
        bit-identical bin assignments to the naive linear scan it replaced —
        the packing semantics (and the curation entry's hash) depend on
        picking the LEFTMOST bin that fits, not just any fitting bin."""
        import random

        from oni_ml_spark.datapipe.chunking import _FirstFitTree

        rng = random.Random(42)
        for trial in range(20):
            capacity = rng.choice([16, 64, 2048])
            sizes = [rng.randint(0, capacity + 5) for _ in range(rng.randint(1, 400))]
            # linear reference (the pre-r05 implementation)
            remaining: list[int] = []
            want = []
            for n in sizes:
                for bi, rem in enumerate(remaining):
                    if rem >= n:
                        remaining[bi] = rem - n
                        want.append(bi)
                        break
                else:
                    remaining.append(max(capacity - n, 0))
                    want.append(len(remaining) - 1)
            ff = _FirstFitTree()
            got = []
            for n in sizes:
                bi = ff.first_fit(n)
                if bi >= 0:
                    ff.take(bi, n)
                else:
                    bi = ff.n
                    ff.append(max(capacity - n, 0))
                got.append(bi)
            assert got == want, (trial, capacity)
            # tree leaves mirror the reference's remaining capacities
            assert [ff.tree[ff.size + i] for i in range(ff.n)] == remaining

    def test_scales_past_many_open_bins(self):
        """100k docs that each open a bin (worst case for the linear scan:
        O(bins) per doc, quadratic overall) must finish fast — the tree
        makes it O(n log n)."""
        import time

        from oni_ml_spark.datapipe.chunking import _FirstFitTree

        ff = _FirstFitTree()
        t0 = time.perf_counter()
        for _ in range(100_000):
            if ff.first_fit(10) < 0:
                ff.append(0)  # every bin fills exactly: always a new bin
        assert ff.n == 100_000
        assert time.perf_counter() - t0 < 5.0
