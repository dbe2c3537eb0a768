"""Incremental IVF index maintenance (similarity.assign_cells / ivf_append /
ivf_index_stats / ivf_rebuild_due): batching invariance, agreement with
MLlib's own assignment, conflict modes, search behavior after append,
rebuild heuristic, guards."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from oni_ml_spark.datapipe.similarity import (
    _prep_members,
    assign_cells,
    build_ivf_index,
    ivf_append,
    ivf_index_stats,
    ivf_rebuild_due,
    ivf_search,
)

DIM = 16


def _vecs(n, seed, shift=0.0):
    rng = random.Random(seed)
    return [
        (i, [rng.gauss(shift, 1.0) for _ in range(DIM)])
        for i in range(n)
    ]


def _df(spark, rows, id_offset=0):
    return spark.createDataFrame(
        [(i + id_offset, v) for i, v in rows], "vec_id bigint, embedding array<double>"
    )


@pytest.fixture(scope="module")
def index(spark):
    corpus = _df(spark, _vecs(200, seed=11))
    cent, assigned = build_ivf_index(corpus, n_cells=8, seed=7)
    return corpus, cent, assigned.localCheckpoint()


class TestAssign:
    def test_agrees_with_mllib_assignment(self, spark, index):
        """Our SQL euclidean argmin lands every vector in the same cell
        MLlib's model.transform chose during the build — the frozen-centroid
        contract that makes append == rebuild-with-same-centroids."""
        corpus, cent, assigned = index
        ours = {
            r["neighbor_id"]: r["cell"]
            for r in assign_cells(cent, _prep_members(corpus, "vec_id", "embedding")).collect()
        }
        mllib = {r["neighbor_id"]: r["cell"] for r in assigned.collect()}
        assert ours == mllib

    def test_batching_invariance(self, spark, index):
        """Appending a delta in two halves == appending it at once — the
        assignment depends only on the frozen centroids."""
        _, cent, assigned = index
        delta = _vecs(60, seed=23)
        one = ivf_append(cent, assigned, _df(spark, delta, id_offset=1000))
        a = ivf_append(cent, assigned, _df(spark, delta[:30], id_offset=1000))
        b = ivf_append(cent, a, _df(spark, delta[30:], id_offset=1000))
        got_one = {r["neighbor_id"]: r["cell"] for r in one.collect()}
        got_two = {r["neighbor_id"]: r["cell"] for r in b.collect()}
        assert got_one == got_two

    def test_conflicting_duplicate_vectors_refused(self, spark, index):
        """The same id arriving twice in one batch with DIFFERENT vectors
        would merge into a hybrid (cell from one, cv from the other) —
        refused in-plan, id named."""
        _, cent, assigned = index
        bad = spark.createDataFrame(
            [(4242, [1.0] * DIM), (4242, [2.0] * DIM)],
            "vec_id bigint, embedding array<double>",
        )
        with pytest.raises(Exception, match="conflicting vectors"):
            ivf_append(cent, assigned, bad, on_conflict="replace").collect()

    def test_same_vector_duplicate_collapses(self, spark, index):
        _, cent, assigned = index
        twice = spark.createDataFrame(
            [(4242, [1.0] * DIM), (4242, [1.0] * DIM)],
            "vec_id bigint, embedding array<double>",
        )
        out = ivf_append(cent, assigned, twice, on_conflict="replace")
        assert out.filter(F.col("neighbor_id") == 4242).count() == 1

    def test_dim_mismatch_raises_in_plan(self, spark, index):
        _, cent, assigned = index
        bad = spark.createDataFrame(
            [(9999, [1.0, 2.0])], "vec_id bigint, embedding array<double>"
        )
        with pytest.raises(Exception, match="vector dim"):
            ivf_append(cent, assigned, bad, on_conflict="replace").collect()


class TestConflicts:
    def test_error_names_the_id(self, spark, index):
        corpus, cent, assigned = index
        dup = corpus.limit(1)
        with pytest.raises(ValueError, match="already in the index"):
            ivf_append(cent, assigned, dup)

    def test_replace_swaps_the_vector(self, spark, index):
        _, cent, assigned = index
        target = assigned.orderBy("neighbor_id").first()
        moved = spark.createDataFrame(
            [(target["neighbor_id"], [100.0] * DIM)],
            "vec_id bigint, embedding array<double>",
        )
        out = ivf_append(cent, assigned, moved, on_conflict="replace")
        assert out.count() == assigned.count()
        row = out.filter(F.col("neighbor_id") == target["neighbor_id"]).first()
        assert row["cv"] == [100.0] * DIM

    def test_ignore_keeps_the_index(self, spark, index):
        _, cent, assigned = index
        target = assigned.orderBy("neighbor_id").first()
        moved = spark.createDataFrame(
            [(target["neighbor_id"], [100.0] * DIM), (5000, [1.0] * DIM)],
            "vec_id bigint, embedding array<double>",
        )
        out = ivf_append(cent, assigned, moved, on_conflict="ignore")
        assert out.count() == assigned.count() + 1
        row = out.filter(F.col("neighbor_id") == target["neighbor_id"]).first()
        assert row["cv"] == target["cv"]

    def test_bad_mode_rejected(self, spark, index):
        _, cent, assigned = index
        with pytest.raises(ValueError, match="on_conflict"):
            ivf_append(cent, assigned, _df(spark, _vecs(1, 1), 7000), on_conflict="upsert")


class TestSearchAfterAppend:
    def test_appended_neighbor_found(self, spark, index):
        """Plant a near-copy of a corpus vector via append; probed search
        from that vector finds the planted twin at rank 1."""
        corpus, cent, assigned = index
        base = corpus.first()
        twin = [x + 1e-4 for x in base["embedding"]]
        out = ivf_append(
            cent, assigned,
            spark.createDataFrame(
                [(7777, twin)], "vec_id bigint, embedding array<double>"
            ),
        )
        res = ivf_search(
            corpus.filter(F.col("vec_id") == base["vec_id"]),
            cent, out, k=1, n_probe=2,
        ).first()
        assert res["neighbor_id"] == 7777
        assert res["sim"] >= 0.9999


class TestRebuildHeuristic:
    def test_balanced_index_not_due(self, spark, index):
        _, cent, assigned = index
        verdict = ivf_rebuild_due(cent, assigned)
        assert verdict["n_vectors"] == 200 and verdict["n_cells"] == 8
        assert not verdict["due"]

    def test_skewed_appends_trigger(self, spark, index):
        """A drifted delta (all mass far from every centroid) piles into
        few cells and flips the trigger."""
        _, cent, assigned = index
        skew = _df(spark, _vecs(800, seed=31, shift=50.0), id_offset=20000)
        out = ivf_append(cent, assigned, skew)
        verdict = ivf_rebuild_due(cent, out, max_cell_frac=0.25)
        assert verdict["n_vectors"] == 1000
        assert verdict["max_frac"] > 0.25 and verdict["due"]

    def test_stats_include_empty_cells(self, spark, index):
        _, cent, assigned = index
        only_low = assigned.filter(F.col("cell") <= 2)
        stats = {r["cell"]: r["n_members"] for r in ivf_index_stats(cent, only_low).collect()}
        assert set(stats) == set(range(8))
        assert all(stats[c] == 0 for c in range(3, 8))


class TestPersistence:
    def test_save_load_roundtrip_and_refresh_loop(self, spark, index, tmp_path):
        """build -> save v0 -> load -> append the day's delta -> save v1 ->
        load picks v1; the daily-refresh loop the module is for."""
        from oni_ml_spark.datapipe.similarity import (
            _ivf_versions,
            load_ivf_index,
            save_ivf_index,
        )

        _, cent, assigned = index
        root = str(tmp_path / "ivf")
        assert save_ivf_index(cent, assigned, root) == 0
        c0, m0, conf0 = load_ivf_index(spark, root)
        assert conf0["n_cells"] == 8 and conf0["dim"] == DIM
        assert conf0["n_members"] == 200 and m0.count() == 200

        delta = _df(spark, _vecs(40, seed=99), id_offset=3000)
        out = ivf_append(c0, m0, delta)
        assert save_ivf_index(c0, out, root) == 1
        _, m1, conf1 = load_ivf_index(spark, root)
        assert conf1["version"] == 1 and conf1["n_members"] == 240
        assert m1.count() == 240
        # pinned old version still loadable while within keep_versions
        _, m_old, _ = load_ivf_index(spark, root, version=0)
        assert m_old.count() == 200

    def test_keep_versions_prunes(self, spark, index, tmp_path):
        from oni_ml_spark.datapipe.similarity import (
            _ivf_versions,
            load_ivf_index,
            save_ivf_index,
        )

        _, cent, assigned = index
        root = str(tmp_path / "ivf_prune")
        save_ivf_index(cent, assigned, root, keep_versions=1)
        save_ivf_index(cent, assigned, root, keep_versions=1)
        assert _ivf_versions(spark, root) == [1]
        with pytest.raises(ValueError, match="not committed"):
            load_ivf_index(spark, root, version=0)

    def test_orphan_uncommitted_version_ignored(self, spark, index, tmp_path):
        """A crashed save (no _conf) must be invisible to the loader and
        must not block the next save."""
        from oni_ml_spark.datapipe.similarity import (
            load_ivf_index,
            save_ivf_index,
        )

        _, cent, assigned = index
        root = str(tmp_path / "ivf_orphan")
        save_ivf_index(cent, assigned, root)
        # orphan v000001: centroids+members but NO conf
        cent.write.parquet(f"{root}/v000001/centroids")
        _, _, conf = load_ivf_index(spark, root)
        assert conf["version"] == 0
        # ...and the next save numbers PAST the orphan instead of
        # colliding with it — the writer half of the crash contract
        assert save_ivf_index(cent, assigned, root) == 2
        _, _, conf2 = load_ivf_index(spark, root)
        assert conf2["version"] == 2
        # (r10) the successful save swept the dead orphan — without the
        # sweep, crashed-save dirs accumulate unboundedly under root
        import os

        assert not os.path.exists(f"{root}/v000001")
        assert os.path.exists(f"{root}/v000000") and os.path.exists(f"{root}/v000002")

    def test_empty_root_raises(self, spark, tmp_path):
        from oni_ml_spark.datapipe.similarity import load_ivf_index

        with pytest.raises(ValueError, match="no committed version"):
            load_ivf_index(spark, str(tmp_path / "nothing"))

    def test_foreign_conf_mismatch_raises(self, spark, index, tmp_path):
        from oni_ml_spark.datapipe.similarity import (
            load_ivf_index,
            save_ivf_index,
        )

        _, cent, assigned = index
        root = str(tmp_path / "ivf_bad")
        save_ivf_index(cent, assigned, root)
        # corrupt: overwrite the conf with a wrong cell count
        spark.createDataFrame(
            [(99, DIM, 200, 0)], "n_cells int, dim int, n_members bigint, version int"
        ).write.mode("overwrite").parquet(f"{root}/v000000/_conf")
        with pytest.raises(ValueError, match="corrupted or foreign"):
            load_ivf_index(spark, root)


class TestRandomProjection:
    def test_signs_and_components_hand_checked(self, spark):
        from oni_ml_spark.datapipe.similarity import _md5_signs, random_projection

        signs = _md5_signs(out_dim=2, dim=3)
        df = spark.createDataFrame(
            [(1, [1.0, 2.0, 3.0])], "vec_id bigint, embedding array<double>"
        )
        got = random_projection(
            df, "vec_id", "embedding", out_dim=2, dim=3, scale=False
        ).first()["proj"]
        want = [sum(v * s for v, s in zip([1.0, 2.0, 3.0], row)) for row in signs]
        assert got == want
        assert all(s in (-1.0, 1.0) for row in signs for s in row)

    def test_norm_preserved_in_expectation(self, spark):
        """JL with the 1/sqrt(k) scale: mean squared-norm ratio over many
        vectors stays near 1 (k=16 → se of the mean ~ 2.5%)."""
        from oni_ml_spark.datapipe.similarity import random_projection

        corpus = _df(spark, _vecs(300, seed=5))
        proj = random_projection(corpus, "vec_id", "embedding", out_dim=16, dim=DIM)
        r = (
            proj.select(
                F.aggregate("proj", F.lit(0.0), lambda a, x: a + x * x).alias("pn")
            )
            .agg(F.avg("pn"))
            .first()[0]
        )
        base = (
            _df(spark, _vecs(300, seed=5))
            .select(
                F.aggregate(
                    F.transform("embedding", lambda x: x.cast("double")),
                    F.lit(0.0),
                    lambda a, x: a + x * x,
                ).alias("n")
            )
            .agg(F.avg("n"))
            .first()[0]
        )
        assert r / base == pytest.approx(1.0, rel=0.15)

    def test_dim_mismatch_raises(self, spark):
        from oni_ml_spark.datapipe.similarity import random_projection

        df = spark.createDataFrame(
            [(1, [1.0, 2.0])], "vec_id bigint, embedding array<double>"
        )
        with pytest.raises(Exception, match="dim"):
            random_projection(df, "vec_id", "embedding", out_dim=2, dim=3).collect()

    def test_salt_changes_matrix(self, spark):
        from oni_ml_spark.datapipe.similarity import _md5_signs

        assert _md5_signs(4, 32, "jl") != _md5_signs(4, 32, "other")


class TestPlanShape:
    def test_assign_is_broadcast_no_pair_shuffle(self, spark, index):
        """The centroid table is broadcast and the argmin aggregate
        partial-combines: no sort-merge join, one exchange keyed on the
        member id only."""
        corpus, cent, _ = index
        plan = (
            assign_cells(cent, _prep_members(corpus, "vec_id", "embedding"))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "SortMergeJoin" not in plan
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
        assert "partial_min" in plan or "partial min" in plan.lower()
