"""Run the north-star mapping (BASELINE.json: 100k cells × 50k spots to
loss-parity in < 60 s on a v5e-8) end-to-end on real hardware, one command:

    python scripts/north_star.py                     # full 100k × 50k
    python scripts/north_star.py --mesh 2d
    python scripts/north_star.py --tiny              # CI smoke shape

Uses every visible device as a fused-sharded mesh
(``tangram_tpu.parallel.fit_mapping_fused_sharded``): 1-D ``("cell",)`` by
default — each chip holds full rows of M, two psums per step move the
(spots × genes) projection over ICI. Data is a synthetic Poisson draw (the
hot loop is memory-bound: timing is shape-determined, the score value is
fixture-specific). Prints one JSON line.

Smoke-tested on the 8-virtual-device CPU mesh in CI
(tests/test_north_star_script.py).
"""

import argparse
import json
import sys
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--cells", type=int, default=100_000)
    p.add_argument("--spots", type=int, default=50_000)
    p.add_argument("--genes", type=int, default=249)
    p.add_argument("--epochs", type=int, default=1000)
    p.add_argument("--lr", type=float, default=0.1)
    p.add_argument("--mesh", choices=["1d", "2d"], default="1d")
    p.add_argument("--moment-dtype", default="bfloat16")
    p.add_argument("--compute-dtype", default="bfloat16")
    p.add_argument("--parity-tol", type=float, default=1e-4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tiny", action="store_true",
                   help="96×40×12 cells×spots×genes, 5 epochs (CI smoke)")
    return p.parse_args(argv)


def run(args) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from tangram_tpu.models.mapper import init_logits
    from tangram_tpu.ops.losses import LossWeights, MapperData
    from tangram_tpu.parallel.fused_sharded import fit_mapping_fused_sharded

    if args.tiny:
        args.cells, args.spots, args.genes, args.epochs = 96, 40, 12, 5

    devices = np.asarray(jax.devices())
    if args.mesh == "1d":
        mesh = Mesh(devices.reshape(-1), axis_names=("cell",))
    else:
        from tangram_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(devices=list(devices))

    rng = np.random.default_rng(args.seed)
    S = jnp.asarray(rng.poisson(1.0, (args.cells, args.genes)), jnp.float32)
    G = jnp.asarray(rng.poisson(2.0, (args.spots, args.genes)), jnp.float32)
    d = rng.random(args.spots).astype(np.float32)
    data = MapperData(S=S, G=G, d=jnp.asarray(d / d.sum()))
    lw = LossWeights(lambda_g1=1.0, lambda_d=1.0)

    kwargs = dict(
        mesh=mesh,
        moment_dtype=jnp.dtype(args.moment_dtype),
        compute_dtype=jnp.dtype(args.compute_dtype),
        donate=True,
    )

    # jax-PRNG init: at 100k×50k a host-side numpy N(0,1) draw would need
    # 40 GB of host float64
    M0 = init_logits(args.cells, args.spots, args.seed, method="jax")
    params, history = fit_mapping_fused_sharded(  # compile + warm run
        M0, data, lw, args.epochs, args.lr, **kwargs
    )
    jax.block_until_ready(params)
    del params, history

    M0 = init_logits(args.cells, args.spots, args.seed, method="jax")
    t0 = time.perf_counter()
    params, history = fit_mapping_fused_sharded(
        M0, data, lw, args.epochs, args.lr, **kwargs
    )
    main_loss = np.asarray(history["main_loss"])
    jax.block_until_ready(params)
    elapsed = time.perf_counter() - t0

    final_score = float(main_loss[-1])
    target = final_score - args.parity_tol
    reached = np.nonzero(main_loss >= target)[0]
    parity_epoch = int(reached[0]) if len(reached) else args.epochs
    seconds_to_parity = parity_epoch * elapsed / args.epochs

    return {
        "metric": f"north_star_{args.cells}x{args.spots}x{args.genes}"
                  f"_{args.epochs}_epochs",
        "value": round(elapsed, 3),
        "unit": "seconds",
        "seconds_to_loss_parity": round(seconds_to_parity, 3),
        "parity_epoch": parity_epoch,
        "ms_per_step": round(elapsed / args.epochs * 1e3, 3),
        "final_train_score": round(final_score, 4),
        "meets_60s_target": bool(seconds_to_parity < 60.0),
        "mesh": f"{args.mesh} over {devices.size} {devices.flat[0].platform} "
                "devices",
        "data": "synthetic-poisson",
        "backend": jax.default_backend(),
    }


def main(argv=None):
    result = run(parse_args(argv))
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
