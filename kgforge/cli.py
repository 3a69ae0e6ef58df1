"""CLI entry points mirroring the reference's lifecycle
(``REF?:train.py / eval / predict`` — SURVEY §3.1) plus the flagship
KG pipeline.  This script OWNS its Ray session (guarded init — the
driver contract forbids library-level ray.init, SURVEY §0.3).

    python -m kgforge.cli train   --model {hmm,bilstm_crf} --out DIR
    python -m kgforge.cli eval    --model {hmm,bilstm_crf} --model-dir DIR
    python -m kgforge.cli predict --model-dir DIR --text 王伟在华为工作。
    python -m kgforge.cli flagship --t0 DIR --model-dir DIR --out DIR
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_train(args) -> None:
    from kgforge.oracle.corpus import corpus_to_conll, generate_corpus
    from kgforge.oracle.vocab import build_vocab, count_chars

    os.makedirs(args.out, exist_ok=True)
    train = generate_corpus(args.n_train, seed=args.seed)
    if args.scheme == "bioes":
        from kgforge.oracle.corpus import Sentence
        from kgforge.oracle.labels import bio_to_bioes

        train = [Sentence(s.chars, bio_to_bioes(s.tags)) for s in train]
    with open(os.path.join(args.out, "train.txt"), "w") as f:
        f.write(corpus_to_conll(train))
    vocab = build_vocab(count_chars(train))
    if args.model == "hmm":
        _ray()
        import ray.data as rd

        from kgforge.oracle.labels import BIO_TAGS, BIOES_TAGS
        from kgforge.stages.tagger import train_hmm_distributed

        import pyarrow as pa

        tags = BIOES_TAGS if args.scheme == "bioes" else BIO_TAGS
        tbl = pa.table({
            "chars": pa.array([s.chars for s in train]),
            "tags": pa.array([s.tags for s in train]),
        })
        model = train_hmm_distributed(rd.from_arrow(tbl), vocab, tuple(tags))
        path = os.path.join(args.out, "hmm.npz")
    else:
        from kgforge.oracle import bilstm_crf as bc

        from kgforge.oracle.labels import BIO_TAGS, BIOES_TAGS

        tags = BIOES_TAGS if args.scheme == "bioes" else BIO_TAGS
        model = bc.fit(train, vocab, tags=tags, epochs=args.epochs,
                       seed=args.seed)
        path = os.path.join(args.out, "bilstm_crf.npz")
    model.save(path)
    print(json.dumps({"model": args.model, "path": path,
                      "n_train": args.n_train}))


def _load(model_dir: str, model: str):
    if model == "hmm":
        from kgforge.oracle.hmm import HmmModel

        return HmmModel.load(os.path.join(model_dir, "hmm.npz"))
    from kgforge.oracle.bilstm_crf import BiLstmCrfModel

    return BiLstmCrfModel.load(os.path.join(model_dir, "bilstm_crf.npz"))


def cmd_eval(args) -> None:
    import pyarrow as pa

    from kgforge.oracle.corpus import generate_corpus

    _ray()
    import ray.data as rd

    from kgforge.stages.evaluate import evaluate_ds
    from kgforge.stages.tagger import BiLstmCrfTagger, HmmTagger

    test = generate_corpus(args.n_test, seed=args.seed + 57)
    tbl = pa.table({
        "sent_text": pa.array([s.text for s in test]),
        "gold_tags": pa.array([s.tags for s in test]),
    })
    cls = HmmTagger if args.model == "hmm" else BiLstmCrfTagger
    name = "hmm.npz" if args.model == "hmm" else "bilstm_crf.npz"
    tagged = rd.from_arrow(tbl).repartition(8).map_batches(
        cls, fn_constructor_kwargs={
            "model_path": os.path.join(args.model_dir, name)},
        batch_format="pyarrow", concurrency=(1, 4))
    for row in evaluate_ds(tagged):
        print(json.dumps({k: round(v, 4) if isinstance(v, float) else v
                          for k, v in row.items()}))


def cmd_predict(args) -> None:
    from kgforge.oracle.labels import extract_entities

    model = _load(args.model_dir, args.model)
    if args.model == "hmm":
        from kgforge.oracle.hmm import decode_texts
    else:
        from kgforge.oracle.bilstm_crf import decode_texts
    tags = decode_texts(model, [args.text])[0]
    ents = [{"etype": e, "surface": args.text[s:t]}
            for e, s, t in extract_entities(tags)]
    print(json.dumps({"text": args.text, "tags": tags,
                      "entities": ents}, ensure_ascii=False))


def cmd_flagship(args) -> None:
    _ray()
    from kgforge.pipelines.flagship import run_flagship

    res = run_flagship(t0_path=args.t0,
                       model_path=os.path.join(args.model_dir, "hmm.npz"),
                       ckpt_root=args.ckpt, out_dir=args.out)
    print(json.dumps({"edges": res["edges"].count(),
                      "nodes": res["nodes"].count(),
                      "timings": res["timings"]}))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="kgforge")
    sub = ap.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train")
    t.add_argument("--model", choices=["hmm", "bilstm_crf"], default="hmm")
    t.add_argument("--scheme", choices=["bio", "bioes"], default="bio")
    t.add_argument("--out", required=True)
    t.add_argument("--n-train", type=int, default=2000)
    t.add_argument("--epochs", type=int, default=10)
    t.add_argument("--seed", type=int, default=42)
    t.set_defaults(fn=cmd_train)

    e = sub.add_parser("eval")
    e.add_argument("--model", choices=["hmm", "bilstm_crf"], default="hmm")
    e.add_argument("--model-dir", required=True)
    e.add_argument("--n-test", type=int, default=500)
    e.add_argument("--seed", type=int, default=42)
    e.set_defaults(fn=cmd_eval)

    p = sub.add_parser("predict")
    p.add_argument("--model", choices=["hmm", "bilstm_crf"], default="hmm")
    p.add_argument("--model-dir", required=True)
    p.add_argument("--text", required=True)
    p.set_defaults(fn=cmd_predict)

    f = sub.add_parser("flagship")
    f.add_argument("--t0", required=True)
    f.add_argument("--model-dir", required=True)
    f.add_argument("--ckpt", required=True)
    f.add_argument("--out", required=True)
    f.set_defaults(fn=cmd_flagship)

    q = sub.add_parser("query", help="run a registry operator by name")
    q.add_argument("--name", required=True)
    q.add_argument("--sf-dir", required=True)
    q.add_argument("--out", default=None,
                   help="parquet output path (default: print head)")
    q.set_defaults(fn=cmd_query)

    args = ap.parse_args(argv)
    args.fn(args)
    return 0


def cmd_query(args) -> None:
    """Run any registry operator over a table dir; write parquet or
    print the head — the "switch one pipeline over" entry point."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    _ray()
    from kgforge.pipelines.driver_queries import QUERIES

    if args.name not in QUERIES:
        close = [n for n in sorted(QUERIES) if args.name in n]
        raise SystemExit(f"unknown query {args.name!r}; close: {close}")
    res = QUERIES[args.name](args.sf_dir)
    if hasattr(res, "to_arrow_refs"):           # ray Dataset
        import ray

        tbl = pa.concat_tables(ray.get(res.to_arrow_refs()))
    elif isinstance(res, pa.Table):
        tbl = res
    else:                                       # pandas
        tbl = pa.Table.from_pandas(res)
    if args.out:
        pq.write_table(tbl, args.out)
        print(json.dumps({"query": args.name, "rows": tbl.num_rows,
                          "out": args.out}))
    else:
        print(tbl.slice(0, 20).to_pandas().to_string())
        print(f"... {tbl.num_rows} rows")


if __name__ == "__main__":
    sys.exit(main())
