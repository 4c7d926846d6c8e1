#!/usr/bin/env python
"""Per-EM-round cost curve for unigram-LM training (round 10): hard
(Viterbi) vs full-lattice (forward-backward) E-steps on the SAME
synthetic million-scale word table the BPE curve uses. Prints one JSON
line with per-round seconds — the evidence that (a) per-round cost is
FLAT in the round index (each round is one Arrow pass over the word
table + a vocabulary-keyed aggregation, nothing accumulates), and (b)
the full-lattice E-step costs a small constant factor over hard EM,
not a different complexity class.

Usage: python scripts/unigram_curve.py [n_rounds]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bpe_curve import synthetic_words  # same seeded Heaps-scale table


def main() -> None:
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    n_vocab = int(os.environ.get("UNIGRAM_CURVE_VOCAB", "300000"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))

    from flask_data_pipes_spark.operators import unigram
    from flask_data_pipes_spark.session import EngineConfig, get_spark

    spark = get_spark(
        EngineConfig(app_name="unigram-curve", master=f"local[{cpus}]")
    )
    spark.sparkContext.setLogLevel("ERROR")
    words = synthetic_words(spark, n_vocab).repartition(32).localCheckpoint(
        eager=True
    )
    n_words = words.count()

    params = dict(
        vocab_size=2000, n_iters=n_rounds, max_piece_len=6,
        seed_size=4000, min_count=2, words=words,
    )

    def run(em):
        times, sizes = [], []

        def cb(i, vocab, dt):
            times.append(round(dt, 3))
            sizes.append(len(vocab))
            print(f"# {em} round {i}: {dt:.2f}s, {len(vocab)} pieces",
                  file=sys.stderr, flush=True)

        vocab = unigram.unigram_train(em=em, on_iter=cb, **params)
        return vocab, times, sizes

    hard_vocab, hard_times, hard_sizes = run("hard")
    full_vocab, full_times, full_sizes = run("full")
    hard_pieces = {p for p, _, _ in hard_vocab}
    full_pieces = {p for p, _, _ in full_vocab}
    overlap = len(hard_pieces & full_pieces) / max(1, len(hard_pieces | full_pieces))

    out = {
        "metric": "unigram_per_round_cost",
        "n_words": n_words,
        "n_rounds": n_rounds,
        "hard_round_sec": hard_times,
        "full_round_sec": full_times,
        "hard_vocab_sizes": hard_sizes,
        "full_vocab_sizes": full_sizes,
        "full_over_hard_factor": round(
            sum(full_times) / max(1e-9, sum(hard_times)), 2
        ),
        "final_vocab_jaccard_hard_vs_full": round(overlap, 4),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
