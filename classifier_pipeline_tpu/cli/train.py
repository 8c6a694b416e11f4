"""train CLI (reference src/train.py + src/train/train.py)."""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(description="train the classifier")
    parser.add_argument("name", help="run name")
    parser.add_argument("-c", "--config-file")
    parser.add_argument("-d", "--data-dir", default="training-data")
    parser.add_argument("-o", "--out-dir", default="train")
    parser.add_argument("--model-name", default="wr-resnet")
    parser.add_argument("--epochs", type=int, default=40)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--learning-rate", type=float, default=1e-3)
    parser.add_argument("--depth", type=int, default=22)
    parser.add_argument("--k", type=int, default=4)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("-w", "--weights", help="msgpack weights to resume from")
    parser.add_argument("--fine-tune", action="store_true",
                        help="reinitialize the prediction head")
    parser.add_argument("--grid-search", action="store_true")
    parser.add_argument(
        "--benchmark", type=int, metavar="STEPS", default=0,
        help="time STEPS synthetic training steps and print throughput",
    )
    parser.add_argument("--mixed-precision", action="store_true",
                        help="bfloat16 compute (TPU-idiomatic)")
    parser.add_argument("--platform", choices=["tpu", "cpu", "default"], default="default")
    args = parser.parse_args(argv)
    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from classifier_pipeline_tpu.train.trainer import Trainer
    from classifier_pipeline_tpu.utils.logs import init_logging
    from classifier_pipeline_tpu.utils.tools import enable_compile_cache

    init_logging()

    enable_compile_cache()
    hp = {"depth": args.depth, "k": args.k}
    if args.mixed_precision:
        hp["mixed_precision"] = True
    if args.benchmark:
        import json

        res = Trainer.benchmark(
            args.model_name, batch_size=args.batch_size,
            n_steps=args.benchmark, hyperparams=hp,
            mixed_precision=args.mixed_precision,
        )
        print(json.dumps({k: round(v, 2) for k, v in res.items()}))
        return 0
    if args.grid_search:
        # reference src/train/search.py grid over depth/k
        import logging

        results = {}
        for depth in (10, 16, 22):
            for k in (2, 4):
                t = Trainer(
                    f"{args.name}-d{depth}k{k}", args.data_dir,
                    args.out_dir, args.model_name,
                    {"depth": depth, "k": k}, seed=args.seed,
                )
                t.train(
                    epochs=args.epochs, batch_size=args.batch_size,
                    learning_rate=args.learning_rate,
                )
                results[f"d{depth}k{k}"] = t.history["val_loss"][-1]
        logging.info("grid results: %s", results)
        return 0
    trainer = Trainer(
        args.name, args.data_dir, args.out_dir, args.model_name, hp,
        seed=args.seed, weights=args.weights, fine_tune=args.fine_tune,
    )
    trainer.train(
        epochs=args.epochs,
        batch_size=args.batch_size,
        learning_rate=args.learning_rate,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
