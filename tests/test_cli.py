"""CLI entry point (python -m gelos_spark run <conf>|<conf_dir>).

Mirrors the reference CLI contract (gelos/embedding_generation.py:
84-121): one YAML runs alone, a config dir globs and loops every
config; re-running resume-skips completed stages via lineage.
"""

from __future__ import annotations

import pytest

from gelos_spark import cli

CONF_A = """
run_id: cli_a
root: {root}/a
stages:
  - name: tiles
    op: synth_tracker
    args: {{n: 200, seed: 42}}
  - name: cells
    op: cell_encode
    input: tiles
    args: {{res: 12}}
"""

CONF_B = """
run_id: cli_b
root: {root}/b
stages:
  - name: tiles
    op: synth_tracker
    args: {{n: 120, seed: 7}}
"""


def _write_confs(tmp_path):
    d = tmp_path / "confs"
    d.mkdir()
    (d / "a.yaml").write_text(CONF_A.format(root=tmp_path))
    (d / "b.yaml").write_text(CONF_B.format(root=tmp_path))
    (d / "ignored.txt").write_text("not a config")
    return d


def test_resolve_configs(tmp_path):
    d = _write_confs(tmp_path)
    assert [p.name for p in cli.resolve_configs(str(d))] == ["a.yaml", "b.yaml"]
    assert [p.name for p in cli.resolve_configs(str(d / "b.yaml"))] == ["b.yaml"]
    with pytest.raises(FileNotFoundError):
        cli.resolve_configs(str(tmp_path / "missing"))
    with pytest.raises(FileNotFoundError):
        cli.resolve_configs(str(d), pattern="*.json")


def test_run_config_dir_loops_all(spark, tmp_path, capsys):
    d = _write_confs(tmp_path)
    # --keep-session: reuse the test fixture's SparkSession
    rc = cli.main(["run", str(d), "--keep-session"])
    assert rc == 0
    lines = [ln.split("\t") for ln in capsys.readouterr().out.strip().splitlines()]
    assert ["a.yaml", "cells", "200"] in lines
    assert ["a.yaml", "tiles", "200"] in lines
    assert ["b.yaml", "tiles", "120"] in lines

    # both runs committed with lineage on disk
    from gelos_spark.plans.checkpoint import Pipeline

    for sub, run_id, stages in (("a", "cli_a", 2), ("b", "cli_b", 1)):
        pipe = Pipeline(spark, f"{tmp_path}/{sub}", run_id)
        done = pipe.log.lineage(run_id).where("status = 'done'").count()
        assert done == stages

    # second invocation resume-skips: same lineage, no duplicate rows
    cli.main(["run", str(d), "--keep-session"])
    pipe = Pipeline(spark, f"{tmp_path}/a", "cli_a")
    assert pipe.log.lineage("cli_a").where("status = 'done'").count() == 2


def test_ops_lists_registry(capsys):
    assert cli.main(["ops"]) == 0
    out = capsys.readouterr().out.split()
    for name in ("synth_tracker", "cell_encode", "pip_join", "embed", "tsne"):
        assert name in out


def test_root_override_with_config_dir_gets_subroots(spark, tmp_path, capsys):
    """--root over a config DIR must give each config its own
    sub-root: both configs here have a stage named 'tiles', and a
    shared root would let b overwrite a's table while a's done marker
    still claims completion."""
    d = _write_confs(tmp_path)
    rc = cli.main(
        ["run", str(d), "--root", str(tmp_path / "shared"), "--keep-session"]
    )
    assert rc == 0
    from gelos_spark.plans.checkpoint import Pipeline

    pa = Pipeline(spark, str(tmp_path / "shared" / "a"), "cli_a")
    pb = Pipeline(spark, str(tmp_path / "shared" / "b"), "cli_b")
    assert pa.output("tiles").count() == 200  # a's data, not b's
    assert pb.output("tiles").count() == 120


def test_shipped_training_data_config_runs_end_to_end(spark, tmp_path):
    """The checked-in jobs/training_data.yaml (docs branch + round-5
    image branch) must execute, not just validate: multimodal dedup
    end-to-end — synth images -> decode-validate -> thumbnails ->
    perturbed near-copies -> banded phash near-dup -> kNN retrieval —
    with every stage lineage-committed and resume-skippable."""
    root = str(tmp_path / "td")
    assert cli.main(["run", "jobs/training_data.yaml", "--root", root,
                     "--keep-session"]) == 0

    from gelos_spark.plans.checkpoint import Pipeline

    pipe = Pipeline(spark, root, "training_data_v1")
    assert pipe.log.lineage("training_data_v1").where("status = 'done'").count() == 17

    # quality family (r6 cont.): ranked vocabulary, per-doc top-3
    # keywords, and a per-lang gate that keeps ceil(n/2) per group
    vocab = pipe.output("vocab").collect()
    assert [r.rank for r in vocab] == list(range(1, len(vocab) + 1))
    assert all(len(r.term) >= 2 for r in vocab)
    kw = pipe.output("keywords")
    assert kw.where("rank > 3").count() == 0 and kw.count() > 0
    n_feats = pipe.output("feats").count()
    gated = pipe.output("gated").count()
    assert 0 < gated < n_feats

    # docs branch: the survivors stage keeps one doc per duplicate
    # CLUSTER of the GATED corpus (the quality gate feeds dedup) —
    # pinned against a union-find over the committed pairs
    n_docs = pipe.output("gated").count()
    parent = {}

    def _find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pipe.output("near_dups").collect():
        ra, rb = _find(r.id_a), _find(r.id_b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    n_removed = len(parent) - len({_find(x) for x in parent})
    surv = pipe.output("survivors")
    assert surv.count() == n_docs - n_removed
    assert surv.where("component = doc_id").count() == surv.count()

    # image branch pins (seeded synth -> deterministic)
    stats = pipe.output("img_stats").collect()
    assert len(stats) == 64 and all(r.phash_ok for r in stats)
    thumbs = pipe.output("thumbs").collect()
    assert len(thumbs) == 64 and all(r.w == 16 and r.h == 16 for r in thumbs)
    assert pipe.output("img_corpus").count() == 128
    dups = {(r.id_a, r.id_b) for r in pipe.output("img_near_dups").collect()}
    # 63 of the 64 planted (original, perturbed-copy) pairs stay within
    # hamming 6 (one drifts past — deterministic with these seeds), and
    # nothing else collides: every found pair IS a planted pair
    planted = {(r.image_id, r.image_id + "_p") for r in pipe.output("imgs")
               .select("image_id").collect()}
    assert dups <= planted and len(dups) == 63
    assert pipe.output("retrieval").count() == 6

    # declarative layout + maintenance: the clustered stage carries
    # cell stats for manifest pruning, and expire_keep_last left one
    # snapshot per stage table
    cc = pipe.table("chip_cells")
    assert all("cell" in f["stats"] for f in cc.files())
    assert len(cc.snapshots()) == 1

    # second invocation resume-skips: no duplicate lineage
    assert cli.main(["run", "jobs/training_data.yaml", "--root", root,
                     "--keep-session"]) == 0
    assert pipe.log.lineage("training_data_v1").where("status = 'done'").count() == 17
