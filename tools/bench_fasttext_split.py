"""fastText weight-build vs scoring split (VERDICT r8 task 3).

q171's bench wall bundles the once-per-MODEL weight build (vocabulary x
labels dots over the parsed .vec) with per-corpus scoring. Production
builds once, persists (save_token_label_weights — the q147 index-
persistence convention), and every later corpus scores against the
parquet table. This records the split at sf0.1 and the 10x sf1 corpus:

  build_wall   — derive vocab, parse .vec lines, dot, WRITE parquet
  score_wall   — READ persisted weights, classify_documents, count-by
                 collecting the argmax rows

Scoring alone should scale ~linearly with corpus size (explode ->
broadcast join -> two shuffles on doc_id).

Usage: python tools/bench_fasttext_split.py -> one JSON line.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(ROOT, ".scale", "sf1")
WORK = os.path.join(ROOT, ".scale", "fasttext")


def main() -> None:
    from swiftbeaver_spark.llm.weights import (
        classify_documents,
        load_token_label_weights,
        parse_fasttext_vec_lines,
        save_token_label_weights,
        token_label_weights,
    )
    from swiftbeaver_spark.session import get_spark

    sys.path.insert(0, ROOT)
    import __spark_entry__ as entry

    spark = get_spark(app_name="swiftbeaver-bench-fasttext-split")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(WORK, exist_ok=True)
    # warm-up (same discipline as bench.py): executor threads + python
    # worker pool + one tiny build/score round at sf0.001, so the first
    # timed build isn't charged ~5s of one-time session start-up (the
    # round-8 first cut recorded sf0.1 build 8.79s > sf1 build 3.86s —
    # a larger vocabulary "building faster" was exactly that artifact)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(256, numPartitions=32).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).count()
    warm_docs = entry._t(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    warm_labels = spark.createDataFrame(
        [(w,) for w in entry.FASTTEXT_LABELS], "word string"
    )
    warm_vocab = entry._fasttext_vocab(warm_docs, ("__label__",))
    warm_weights = token_label_weights(
        parse_fasttext_vec_lines(
            entry._fasttext_vec_lines(warm_vocab.unionAll(warm_labels)), 4
        ),
        labels=parse_fasttext_vec_lines(entry._fasttext_vec_lines(warm_labels), 4),
    )
    warm_path = os.path.join(WORK, "weights_warm.parquet")
    save_token_label_weights(warm_weights, warm_path)
    classify_documents(warm_docs, load_token_label_weights(spark, warm_path)).count()
    out = {}
    for label, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
        docs = entry._t(spark, sf_dir, "documents").select("doc_id", "text")
        labels = spark.createDataFrame(
            [(w,) for w in entry.FASTTEXT_LABELS], "word string"
        )
        wpath = os.path.join(WORK, f"weights_{label}.parquet")

        t0 = time.time()
        vocab = entry._fasttext_vocab(docs, ("__label__",))
        weights = token_label_weights(
            parse_fasttext_vec_lines(
                entry._fasttext_vec_lines(vocab.unionAll(labels)), 4
            ),
            labels=parse_fasttext_vec_lines(entry._fasttext_vec_lines(labels), 4),
        )
        save_token_label_weights(weights, wpath)
        build_wall = round(time.time() - t0, 3)

        walls = []
        for _ in range(3):
            t0 = time.time()
            n = len(
                classify_documents(
                    docs, load_token_label_weights(spark, wpath)
                ).collect()
            )
            walls.append(round(time.time() - t0, 3))
        out[label] = {
            "docs": n,
            "build_wall_sec": build_wall,
            "score_walls_sec": walls,
            "score_best_sec": min(walls),
        }
        print(f"# {label}: build {build_wall}s, score {walls} ({n} docs)",
              file=sys.stderr)
    out["score_ratio_10x"] = round(
        out["sf1"]["score_best_sec"] / max(out["sf0.1"]["score_best_sec"], 1e-9), 2
    )
    print(json.dumps({"fasttext_build_score_split": out}))


if __name__ == "__main__":
    main()
