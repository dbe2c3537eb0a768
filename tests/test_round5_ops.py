"""Round-5 widening: contiguous row ids, benchmark decontamination removal,
LSH band tuning, and product quantization (PQ encode + ADC search)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


class TestAssignContiguousIds:
    def test_matches_global_key_rank_oracle(self, spark):
        """ids must equal DuckDB's row_number() - 1 in key order — the
        boundary-independence property: wherever the range partitioner cuts,
        offset[pid] + local position IS the global key rank."""
        from oni_ml_spark.datapipe.sampling import assign_contiguous_ids
        from oni_ml_spark.io import load_table

        d = load_table(spark, SF_DIR, "documents")
        got = sorted(
            (r["doc_id"], r["row_id"])
            for r in assign_contiguous_ids(d, "doc_id", num_partitions=7).collect()
        )
        con = duckdb.connect()
        want = sorted(
            con.execute(
                "SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 "
                f"FROM '{SF_DIR}/documents.parquet'"
            ).fetchall()
        )
        assert got == want and len(got) > 0

    def test_string_keys_and_all_columns_preserved(self, spark):
        from oni_ml_spark.datapipe.sampling import assign_contiguous_ids

        df = spark.createDataFrame(
            [("b", 1), ("a", 2), ("c", 3)], "k string, payload int"
        )
        rows = {r["k"]: r for r in assign_contiguous_ids(df, "k", num_partitions=2).collect()}
        assert {k: r["row_id"] for k, r in rows.items()} == {"a": 0, "b": 1, "c": 2}
        assert rows["a"]["payload"] == 2  # original columns survive

    def test_duplicate_keys_rejected(self, spark):
        from oni_ml_spark.datapipe.sampling import assign_contiguous_ids

        df = spark.createDataFrame([(1,), (1,), (2,)], "k long")
        with pytest.raises(Exception, match="duplicate key"):
            assign_contiguous_ids(df, "k", num_partitions=2).collect()

    def test_cross_batch_null_duplicates_rejected(self, spark):
        """Two null string keys straddling an Arrow batch boundary must hit
        the adjacency check — a None sentinel for 'no previous batch' would
        let object-dtype null keys slip through (distinct-object sentinel)."""
        from oni_ml_spark.datapipe.sampling import assign_contiguous_ids

        old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1")
        try:
            df = spark.createDataFrame([(None,), (None,), ("a",)], "k string")
            with pytest.raises(Exception, match="duplicate key"):
                assign_contiguous_ids(df, "k", num_partitions=1).collect()
        finally:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    def test_id_name_collision_rejected(self, spark):
        from oni_ml_spark.datapipe.sampling import assign_contiguous_ids

        df = spark.createDataFrame([(1, 0)], "k long, row_id int")
        with pytest.raises(ValueError, match="already exists"):
            assign_contiguous_ids(df, "k")


class TestRemoveContaminated:
    def test_planted_contamination_dropped_clean_kept(self, spark):
        from oni_ml_spark.datapipe.textstats import remove_contaminated

        bench = "the quick brown fox jumps over the lazy dog every single day"
        rows = [
            (0, "completely unrelated words about distributed query engines "
                "and shuffle partitioning strategies for large clusters"),
            (1, f"prefix text {bench} suffix text"),   # contains the 8-gram
            (2, "short doc"),                           # < n tokens: kept
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        ev = spark.createDataFrame([(bench,)], "text string")
        out = remove_contaminated(df, ev, "doc_id", "text", n=8)
        assert sorted(r["doc_id"] for r in out.collect()) == [0, 2]
        assert out.columns == df.columns

    def test_threshold_loosens_the_gate(self, spark):
        from oni_ml_spark.datapipe.textstats import remove_contaminated

        bench = "alpha beta gamma delta epsilon zeta eta theta"
        # one shared 8-gram out of many: low contamination fraction
        filler = " ".join(f"w{i}" for i in range(100))
        df = spark.createDataFrame(
            [(0, f"{bench} {filler}")], "doc_id long, text string"
        )
        ev = spark.createDataFrame([(bench,)], "text string")
        assert remove_contaminated(df, ev, "doc_id", "text", n=8).count() == 0
        assert (
            remove_contaminated(
                df, ev, "doc_id", "text", n=8, max_contamination=0.5
            ).count()
            == 1
        )


class TestOptimalBands:
    def test_goldens_against_s_curve_midpoints(self):
        from oni_ml_spark.datapipe.dedup import optimal_bands

        # midpoints for 16 hashes: (b=16,r=1)->0.0625, (8,2)->0.354,
        # (4,4)->0.707, (2,8)->0.917, (1,16)->1.0
        assert optimal_bands(16, 0.5) == (8, 2)
        assert optimal_bands(16, 0.7) == (4, 4)
        assert optimal_bands(16, 0.9) == (2, 8)
        assert optimal_bands(16, 0.05) == (16, 1)

    def test_validation(self):
        from oni_ml_spark.datapipe.dedup import optimal_bands

        with pytest.raises(ValueError):
            optimal_bands(1, 0.5)
        with pytest.raises(ValueError):
            optimal_bands(16, 1.0)

    def test_midpoint_is_actually_best_among_factorizations(self):
        """Exhaustive check: the returned (b, r) minimizes
        |(1/b)^(1/r) - t| over every factorization, for a grid of targets."""
        from oni_ml_spark.datapipe.dedup import optimal_bands

        for num_hashes in (12, 16, 24, 64):
            for t10 in range(1, 10):
                t = t10 / 10
                b, r = optimal_bands(num_hashes, t)
                assert b * r == num_hashes
                got_gap = abs((1.0 / b) ** (1.0 / r) - t)
                for rr in range(1, num_hashes + 1):
                    if num_hashes % rr:
                        continue
                    bb = num_hashes // rr
                    assert got_gap <= abs((1.0 / bb) ** (1.0 / rr) - t) + 1e-12


class TestProductQuantization:
    @pytest.fixture(scope="class")
    def emb(self, spark):
        from oni_ml_spark.io import load_table

        return load_table(spark, SF_DIR, "embeddings").cache()

    def test_codebooks_shape_and_determinism(self, spark, emb):
        from oni_ml_spark.datapipe.similarity import build_pq_codebooks

        b1 = build_pq_codebooks(emb, m=4, codes_per_subspace=8, dim=64, seed=7)
        b2 = build_pq_codebooks(emb, m=4, codes_per_subspace=8, dim=64, seed=7)
        assert len(b1) == 4 and all(len(b) == 8 for b in b1)
        assert all(len(c) == 16 for b in b1 for c in b)
        assert b1 == b2  # seeded fits reproduce

    def test_encode_shape_and_code_range(self, spark, emb):
        from oni_ml_spark.datapipe.similarity import build_pq_codebooks, pq_encode

        books = build_pq_codebooks(emb, m=4, codes_per_subspace=8, dim=64)
        enc = pq_encode(emb, "vec_id", "embedding", books)
        rows = enc.collect()
        assert len(rows) == emb.count()
        for r in rows[:50]:
            assert len(r["codes"]) == 4
            assert all(0 <= c < 8 for c in r["codes"])

    def test_planted_copy_is_adc_rank_one(self, spark, emb):
        """A corpus row that IS the query vector shares its codes, so its
        ADC distance equals the query's own quantization error — the
        minimum over the corpus; it must rank first."""
        from oni_ml_spark.datapipe.similarity import (
            build_pq_codebooks,
            pq_encode,
            pq_search,
        )

        books = build_pq_codebooks(emb, m=8, codes_per_subspace=16, dim=64)
        base = emb.select("vec_id", "embedding")
        q = base.filter(F.col("vec_id") < 3)
        planted = q.select(
            (F.col("vec_id") + 500_000).alias("vec_id"), "embedding"
        )
        enc = pq_encode(base.unionByName(planted), "vec_id", "embedding", books)
        top = pq_search(q, enc, books, "vec_id", "embedding", k=3)
        rank1 = {r["query_id"]: r["neighbor_id"] for r in top.filter("rank = 1").collect()}
        assert rank1 == {i: i + 500_000 for i in range(3)}

    def test_adc_recall_on_clustered_data(self, spark):
        """On data WITH neighbor structure (10 well-separated clusters,
        intra-cluster noise ≪ separation) ADC top-5 must recover the exact
        L2 top-5 substantially. (The uniform-random embeddings fixture is
        deliberately NOT used here: in 64-d uniform data pairwise distances
        concentrate, the exact top-5 is noise ordering, and near-zero PQ
        recall is the mathematically expected outcome — the planted-copy
        test covers that fixture.)"""
        import numpy as np

        from oni_ml_spark.datapipe.similarity import (
            build_pq_codebooks,
            pq_encode,
            pq_search,
        )

        rng = np.random.default_rng(11)
        centers = rng.normal(0, 10.0, size=(10, 64))
        pts = np.concatenate(
            [c + rng.normal(0, 0.3, size=(20, 64)) for c in centers]
        )
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(pts)],
            "vec_id long, embedding array<double>",
        )
        books = build_pq_codebooks(df, m=8, codes_per_subspace=16, dim=64)
        enc = pq_encode(df, "vec_id", "embedding", books)
        q = df.filter(F.col("vec_id").isin(0, 20, 40, 60, 80))
        got = pq_search(q, enc, books, "vec_id", "embedding", k=5)
        approx: dict[int, set[int]] = {}
        for r in got.collect():
            approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        # cluster-level recall: every retrieved neighbor must come from the
        # query's own cluster (ids 20q..20q+19). Within-cluster ORDER is not
        # asserted — intra-cluster distance differences (noise scale 0.3)
        # sit below the quantization error of a 16-code codebook spanning
        # the full ±30 range, so exact-rank parity there would test noise.
        for qid in (0, 20, 40, 60, 80):
            cluster = set(range(qid, qid + 20)) - {qid}
            assert approx[qid] <= cluster, (qid, approx[qid])
            assert len(approx[qid]) == 5

    def test_dim_mismatch_raises(self, spark, emb):
        from oni_ml_spark.datapipe.similarity import build_pq_codebooks, pq_encode

        books = build_pq_codebooks(emb, m=4, codes_per_subspace=4, dim=64)
        bad = spark.createDataFrame(
            [(0, [1.0, 2.0])], "vec_id long, embedding array<double>"
        )
        with pytest.raises(Exception, match="do not match"):
            pq_encode(bad, "vec_id", "embedding", books).collect()
        with pytest.raises(ValueError):
            build_pq_codebooks(emb, m=7, codes_per_subspace=4, dim=64)


class TestPQPersistence:
    def test_roundtrip_search_identical(self, spark, tmp_path):
        """Codebooks written to parquet and reloaded must drive pq_search to
        the IDENTICAL result set as the in-memory tensor — the
        build-once/search-many split of a recurring retrieval job."""
        from oni_ml_spark.datapipe.similarity import (
            build_pq_codebooks,
            pq_codebooks_from_df,
            pq_codebooks_to_df,
            pq_encode,
            pq_search,
        )
        from oni_ml_spark.io import load_table

        emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
        books = build_pq_codebooks(emb, m=4, codes_per_subspace=8, dim=64)
        path = str(tmp_path / "pq_books.parquet")
        pq_codebooks_to_df(spark, books).write.parquet(path)
        reloaded = pq_codebooks_from_df(spark.read.parquet(path))
        assert reloaded == books
        enc = pq_encode(emb, "vec_id", "embedding", books)
        q = emb.filter(F.col("vec_id") < 3)
        a = sorted(map(tuple, pq_search(q, enc, books, k=3).collect()))
        b = sorted(map(tuple, pq_search(q, enc, reloaded, k=3).collect()))
        assert a == b and len(a) == 9

    def test_sparse_codebook_table_rejected(self, spark):
        from oni_ml_spark.datapipe.similarity import pq_codebooks_from_df

        df = spark.createDataFrame(
            [(0, 0, [1.0]), (0, 2, [2.0])],  # code 1 missing
            "subspace int, code int, centv array<double>",
        )
        with pytest.raises(ValueError, match="dense"):
            pq_codebooks_from_df(df)
        with pytest.raises(ValueError, match="empty"):
            pq_codebooks_from_df(df.filter("subspace < 0"))


class TestIvfPq:
    def test_planted_copies_found_through_composed_index(self, spark, tmp_path):
        """IVF-PQ end to end: planted exact copies must come back at rank 1
        through probe→ADC, and the whole index must survive a parquet
        round-trip (both tables + the codebook table)."""
        from oni_ml_spark.datapipe.similarity import (
            build_ivf_pq_index,
            ivf_pq_search,
            pq_codebooks_from_df,
            pq_codebooks_to_df,
        )
        from oni_ml_spark.io import load_table

        emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
        q = emb.filter(F.col("vec_id") < 3)
        planted = q.select((F.col("vec_id") + 500_000).alias("vec_id"), "embedding")
        corpus = emb.unionByName(planted)
        cent, codes, books = build_ivf_pq_index(
            corpus, n_cells=8, m=8, codes_per_subspace=16, dim=64
        )
        top = ivf_pq_search(q, cent, codes, books, k=3, n_probe=2)
        rows = top.collect()
        rank1 = {r["query_id"]: r["neighbor_id"] for r in rows if r["rank"] == 1}
        assert rank1 == {i: i + 500_000 for i in range(3)}
        assert all(len([r for r in rows if r["query_id"] == i]) == 3 for i in range(3))

        # persistence round-trip drives identical results
        for df, name in ((cent, "cent"), (codes, "codes")):
            df.write.parquet(str(tmp_path / name))
        pq_codebooks_to_df(spark, books).write.parquet(str(tmp_path / "books"))
        cent2 = spark.read.parquet(str(tmp_path / "cent"))
        codes2 = spark.read.parquet(str(tmp_path / "codes"))
        books2 = pq_codebooks_from_df(spark.read.parquet(str(tmp_path / "books")))
        again = sorted(map(tuple, ivf_pq_search(q, cent2, codes2, books2, k=3, n_probe=2).collect()))
        assert again == sorted(map(tuple, rows))

    def test_empty_queries_and_dim_mismatch_rejected(self, spark):
        from oni_ml_spark.datapipe.similarity import (
            build_ivf_pq_index,
            ivf_pq_search,
        )
        from oni_ml_spark.io import load_table

        emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
        cent, codes, books = build_ivf_pq_index(
            emb, n_cells=4, m=4, codes_per_subspace=8, dim=64
        )
        with pytest.raises(ValueError, match="empty"):
            ivf_pq_search(emb.filter("vec_id < 0"), cent, codes, books)
        bad = spark.createDataFrame(
            [(0, [1.0, 2.0])], "vec_id long, embedding array<double>"
        )
        with pytest.raises(ValueError, match="does not match"):
            ivf_pq_search(bad, cent, codes, books)


class TestIvfPqProbeMetric:
    def test_l2_probe_beats_cosine_probe_on_unnormalized_data(self, spark):
        """The probe metric must be squared L2 (what ADC scores, what KMeans
        cells are Voronoi regions of). Adversarial unnormalized layout:
        cluster A sits at 5·e64 (L2-near the query), cluster B at 100·e1
        (far, but at SMALLER ANGLE to the query) — a cosine probe with
        n_probe=1 picks B and misses every true neighbor; the L2 probe
        must find cluster A."""
        import numpy as np

        from oni_ml_spark.datapipe.similarity import (
            build_ivf_pq_index,
            ivf_pq_search,
        )

        rng = np.random.default_rng(3)
        ca = np.zeros(64); ca[63] = 5.0
        cb = np.zeros(64); cb[0] = 100.0
        a_pts = ca + rng.normal(0, 0.1, size=(20, 64))   # ids 0..19
        b_pts = cb + rng.normal(0, 0.1, size=(20, 64))   # ids 20..39
        pts = np.concatenate([a_pts, b_pts])
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(pts)],
            "vec_id long, embedding array<double>",
        )
        qvec = np.zeros(64); qvec[0] = 4.0; qvec[63] = 3.0
        # angle: cos(q, B)=0.8 > cos(q, A)=0.6, but L2: |q-A|^2=20 << |q-B|^2≈9225
        q = spark.createDataFrame(
            [(1000, [float(x) for x in qvec])],
            "vec_id long, embedding array<double>",
        )
        cent, codes, books = build_ivf_pq_index(
            df, n_cells=2, m=8, codes_per_subspace=8, dim=64
        )
        top = ivf_pq_search(q, cent, codes, books, k=5, n_probe=1).collect()
        assert len(top) == 5
        assert all(r["neighbor_id"] < 20 for r in top), [r["neighbor_id"] for r in top]

    def test_full_probe_equals_flat_pq_search(self, spark):
        """n_probe = n_cells must reproduce flat pq_search over the same
        codes exactly — the metric-consistency invariant tying the probe
        stage to the ADC stage."""
        from oni_ml_spark.datapipe.similarity import (
            build_ivf_pq_index,
            ivf_pq_search,
            pq_search,
        )
        from oni_ml_spark.io import load_table

        emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
        cent, codes, books = build_ivf_pq_index(
            emb, n_cells=4, m=4, codes_per_subspace=8, dim=64
        )
        q = emb.filter(F.col("vec_id") < 3)
        a = sorted(map(tuple, ivf_pq_search(q, cent, codes, books, k=4, n_probe=4).collect()))
        flat = codes.select(F.col("neighbor_id").alias("id"), "codes")
        b = sorted(map(tuple, pq_search(q, flat, books, k=4).collect()))
        assert a == b and len(a) == 12

    def test_corrupt_codebook_tables_rejected(self, spark):
        from oni_ml_spark.datapipe.similarity import pq_codebooks_from_df

        neg = spark.createDataFrame(
            [(0, -1, [1.0]), (0, 0, [2.0])],
            "subspace int, code int, centv array<double>",
        )
        with pytest.raises(ValueError, match="negative"):
            pq_codebooks_from_df(neg)
        dup = spark.createDataFrame(
            [(0, 0, [1.0]), (0, 0, [2.0])],
            "subspace int, code int, centv array<double>",
        )
        with pytest.raises(ValueError, match="duplicate"):
            pq_codebooks_from_df(dup)


class TestMergeUpsert:
    def _base_updates(self, spark):
        base = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
            "k long, name string, v double",
        )
        updates = spark.createDataFrame(
            [(2, "B!", 99.0), (9, "new", 1.0)], "k long, name string, v double"
        )
        return base, updates

    def test_matches_duckdb_merge_semantics(self, spark):
        import duckdb

        from oni_ml_spark.datapipe.sampling import merge_upsert

        base, updates = self._base_updates(spark)
        got = sorted(map(tuple, merge_upsert(base, updates, "k").collect()))
        con = duckdb.connect()
        con.execute("CREATE TABLE b (k BIGINT, name VARCHAR, v DOUBLE)")
        con.execute("INSERT INTO b VALUES (1,'a',10.0),(2,'b',20.0),(3,'c',30.0)")
        con.execute("CREATE TABLE u (k BIGINT, name VARCHAR, v DOUBLE)")
        con.execute("INSERT INTO u VALUES (2,'B!',99.0),(9,'new',1.0)")
        want = sorted(
            con.execute(
                "SELECT * FROM b WHERE k NOT IN (SELECT k FROM u) "
                "UNION ALL SELECT * FROM u"
            ).fetchall()
        )
        assert got == want

    def test_update_only_mode_drops_inserts(self, spark):
        from oni_ml_spark.datapipe.sampling import merge_upsert

        base, updates = self._base_updates(spark)
        got = {r["k"]: r["name"] for r in
               merge_upsert(base, updates, "k", allow_insert=False).collect()}
        assert got == {1: "a", 2: "B!", 3: "c"}

    def test_duplicate_update_keys_rejected(self, spark):
        from oni_ml_spark.datapipe.sampling import merge_upsert

        base, _ = self._base_updates(spark)
        dups = spark.createDataFrame(
            [(2, "x", 1.0), (2, "y", 2.0)], "k long, name string, v double"
        )
        with pytest.raises(ValueError, match="duplicate key"):
            merge_upsert(base, dups, "k")

    def test_null_update_keys_rejected_with_accurate_message(self, spark):
        """A single unique null-key update row must be rejected as a NULL
        KEY, not mislabeled a 'duplicate' (count_distinct skips null
        tuples, which made the old count-vs-distinct check miscount)."""
        from oni_ml_spark.datapipe.sampling import merge_upsert

        base, _ = self._base_updates(spark)
        nulls = spark.createDataFrame(
            [(None, "x", 1.0), (9, "new", 2.0)], "k long, name string, v double"
        )
        with pytest.raises(ValueError, match="null key"):
            merge_upsert(base, nulls, "k")
        comp_base = spark.createDataFrame(
            [(1, "x", 1.0)], "a long, b string, v double"
        )
        comp_nulls = spark.createDataFrame(
            [(1, None, 9.0)], "a long, b string, v double"
        )
        with pytest.raises(ValueError, match="null key"):
            merge_upsert(comp_base, comp_nulls, ["a", "b"])

    def test_null_base_keys_always_survive(self, spark):
        """Null-key base rows can never equi-match an update key, so they
        pass through unchanged — the documented MERGE semantics."""
        from oni_ml_spark.datapipe.sampling import merge_upsert

        base = spark.createDataFrame(
            [(None, "orphan", 0.0), (2, "b", 20.0)], "k long, name string, v double"
        )
        updates = spark.createDataFrame(
            [(2, "B!", 99.0)], "k long, name string, v double"
        )
        got = sorted(
            ((r["k"], r["name"]) for r in merge_upsert(base, updates, "k").collect()),
            key=str,
        )
        assert got == [(2, "B!"), (None, "orphan")]

    def test_composite_keys_and_schema_validation(self, spark):
        from oni_ml_spark.datapipe.sampling import merge_upsert

        base = spark.createDataFrame([(1, "x", 1.0)], "a long, b string, v double")
        upd = spark.createDataFrame([(1, "x", 9.0)], "a long, b string, v double")
        got = merge_upsert(base, upd, ["a", "b"]).collect()
        assert len(got) == 1 and got[0]["v"] == 9.0
        bad = spark.createDataFrame([(1, 1.0)], "a long, v double")
        with pytest.raises(ValueError, match="one schema"):
            merge_upsert(base, bad, "a")
        with pytest.raises(ValueError, match="absent"):
            merge_upsert(base, upd, "zz")
