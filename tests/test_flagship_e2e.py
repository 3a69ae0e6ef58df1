"""Golden-oracle conformance of the distributed flagship pipeline
(SURVEY §5.1): edges/nodes must equal the single-process oracle
exactly (triple P/R = 1.0 ≥ the 0.95 requirement), invariant I1 must
hold, checkpoints must resume, runs must be deterministic."""

import os

import pandas as pd
import pytest

from kgforge.oracle.corpus import generate_interleaved_docs
from kgforge.oracle.pipeline import run_oracle
from kgforge.oracle.triples import triple_prf
from kgforge.pipelines.flagship import run_flagship
from kgforge.sources.interleaved import write_interleaved

KEY = ["subj", "pred", "obj"]


@pytest.fixture(scope="module")
def flagship_result(ray_session, hmm_model, tmp_path_factory):
    root = tmp_path_factory.mktemp("flagship")
    docs = generate_interleaved_docs(150, seed=42)
    model_path = str(root / "hmm.npz")
    hmm_model.save(model_path)
    t0_path = write_interleaved(docs, str(root / "t0"), rows_per_fragment=40)
    res = run_flagship(t0_path=t0_path, model_path=model_path,
                       ckpt_root=str(root / "ckpt"),
                       out_dir=str(root / "graph"),
                       tagger_concurrency=2, verify_i1=True)
    oracle = run_oracle(docs, hmm_model)
    return {"res": res, "oracle": oracle, "root": root, "docs": docs,
            "model_path": model_path, "t0_path": t0_path}


def test_edges_match_oracle_exactly(flagship_result):
    edges = flagship_result["res"]["edges"].to_pandas() \
        .sort_values(KEY).reset_index(drop=True)
    oracle_edges = pd.DataFrame(flagship_result["oracle"]["edges"]) \
        .sort_values(KEY).reset_index(drop=True)[edges.columns]
    pd.testing.assert_frame_equal(edges, oracle_edges)


def test_triple_prf_meets_requirement(flagship_result):
    edges = flagship_result["res"]["edges"].to_pandas()
    prf = triple_prf(edges.to_dict("records"),
                     flagship_result["oracle"]["edges"])
    assert prf["precision"] >= 0.95 and prf["recall"] >= 0.95
    assert prf["precision"] == 1.0 and prf["recall"] == 1.0


def test_nodes_match_oracle(flagship_result):
    nodes = flagship_result["res"]["nodes"].to_pandas() \
        .sort_values("canon_id").reset_index(drop=True)
    oracle_nodes = pd.DataFrame(flagship_result["oracle"]["nodes"]) \
        .sort_values("canon_id").reset_index(drop=True)[nodes.columns]
    pd.testing.assert_frame_equal(nodes, oracle_nodes)


def test_invariant_i1_holds(flagship_result):
    assert flagship_result["res"]["i1_violations"] == 0


def test_alias_map_merges_fixture_aliases(flagship_result):
    alias = flagship_result["res"]["alias_map"]
    pairs = [(("ORG", "华为"), ("ORG", "华为技术有限公司")),
             (("ORG", "腾讯"), ("ORG", "腾讯科技"))]
    for a, b in pairs:
        if a in alias and b in alias:
            assert alias[a] == alias[b], (a, b)


def test_lineage_recorded(flagship_result):
    lineage = flagship_result["res"]["ckpt"].lineage().to_pylist()
    stages = {r["stage"] for r in lineage}
    assert {"sentences", "triples"} <= stages
    assert all(r["status"] == "complete" for r in lineage)


def test_resume_skips_completed_and_matches(flagship_result):
    """Delete the triples checkpoint; rerun must reuse sentences/mentions
    (mtime unchanged) and reproduce identical edges (SURVEY §5.4)."""
    import shutil

    root = flagship_result["root"]
    ckpt_root = str(root / "ckpt")
    sent_mtime = os.path.getmtime(os.path.join(ckpt_root, "sentences", "_SUCCESS"))
    shutil.rmtree(os.path.join(ckpt_root, "triples"))
    res2 = run_flagship(t0_path=flagship_result["t0_path"],
                        model_path=flagship_result["model_path"],
                        ckpt_root=ckpt_root, tagger_concurrency=2)
    assert os.path.getmtime(
        os.path.join(ckpt_root, "sentences", "_SUCCESS")) == sent_mtime
    edges2 = res2["edges"].to_pandas().sort_values(KEY).reset_index(drop=True)
    edges1 = flagship_result["res"]["edges"].to_pandas() \
        .sort_values(KEY).reset_index(drop=True)
    pd.testing.assert_frame_equal(edges1, edges2)


def test_fresh_run_deterministic(flagship_result, tmp_path):
    """Second cold run in a new checkpoint root → identical outputs
    (determinism gate, SURVEY §5.6)."""
    res2 = run_flagship(t0_path=flagship_result["t0_path"],
                        model_path=flagship_result["model_path"],
                        ckpt_root=str(tmp_path / "ckpt2"),
                        tagger_concurrency=2)
    edges2 = res2["edges"].to_pandas().sort_values(KEY).reset_index(drop=True)
    edges1 = flagship_result["res"]["edges"].to_pandas() \
        .sort_values(KEY).reset_index(drop=True)
    pd.testing.assert_frame_equal(edges1, edges2)
