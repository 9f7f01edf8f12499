"""Tutorial: atlas-scale mapping on a device mesh, with checkpointing.

What the reference cannot do at all (its README's answer to running out of
memory is "split your spatial data into parts and map each part"):

1. shard the mapping problem over a multi-chip mesh (1-D over cells, or
   2-D over cells × spots when even single rows of M outgrow a chip);
2. train through the fused Pallas kernels under ``shard_map``;
3. checkpoint mid-run with intact Adam state and resume after preemption.

Run: ``python examples/tutorial_atlas_mesh.py [--quick]``

Without TPU hardware this runs on a virtual 8-device CPU mesh — the same
code path a v5e-8 slice uses (set a real Mesh over ``jax.devices()`` there).
"""

import argparse
import os
import tempfile

# Virtual 8-device CPU mesh when no multi-chip platform is present;
# must be set before jax initializes.
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np
import pandas as pd


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true", help="tiny shapes")
    parser.add_argument("--full", action="store_true",
                        help="atlas shapes even without TPU devices")
    parser.add_argument("--cpu", action="store_true", help="force CPU devices")
    args = parser.parse_args()

    import jax

    if args.cpu:
        # set BEFORE any backend probe — switching platforms after a remote
        # backend initialized can hang
        jax.config.update("jax_platforms", "cpu")
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu and not args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import tangram_tpu as tg

    # atlas shapes take hours on a CPU mesh — auto-shrink there unless --full
    quick = args.quick or (not on_tpu and not args.full)
    n_cells, n_spots, n_genes = (600, 400, 60) if quick else (20_000, 8_000, 250)
    rng = np.random.default_rng(0)
    S = (rng.poisson(1.5, (n_cells, n_genes)) + 0).astype(np.float32)
    G = (rng.poisson(2.0, (n_spots, n_genes)) + 0).astype(np.float32)
    S[0] += 1
    G[0] += 1

    ad_sc = tg.AnnData(
        X=S,
        obs=pd.DataFrame(index=[f"c{i}" for i in range(n_cells)]),
        var=pd.DataFrame(index=[f"g{i}" for i in range(n_genes)]),
    )
    ad_sp = tg.AnnData(
        X=G,
        obs=pd.DataFrame(index=[f"s{i}" for i in range(n_spots)]),
        var=pd.DataFrame(index=[f"g{i}" for i in range(n_genes)]),
    )
    ad_sp.obsm["spatial"] = rng.random((n_spots, 2)) * 100
    tg.pp_adatas(ad_sc, ad_sp)

    # --- 1. a mesh over all devices -------------------------------------
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices())
    # 1-D over cells is the default production layout: the softmax stays
    # shard-local and only the (spots × genes) projection crosses ICI.
    mesh = Mesh(devices.reshape(-1), axis_names=("cell",))
    print(f"mesh: {mesh.shape} over {len(devices)} {devices[0].platform} device(s)")

    # --- 2. one-call mapping, sharded -----------------------------------
    ad_map = tg.map_cells_to_space(
        ad_sc, ad_sp,
        mode="cells",
        density_prior="rna_count_based",
        num_epochs=100 if quick else 1000,
        random_state=42,
        verbose=False,
        mesh=mesh,
    )
    score = list(ad_map.uns["training_history"]["main_loss"])[-1]
    print(f"sharded mapping done: final train score {score:.4f}")

    # --- 3. checkpointed training for preemptible environments ----------
    from tangram_tpu import checkpoint
    from tangram_tpu.models.mapper import init_logits
    from tangram_tpu.ops.losses import LossWeights, MapperData

    import jax.numpy as jnp

    genes = ad_sc.uns["training_genes"]
    data = MapperData(
        S=jnp.asarray(np.asarray(ad_sc[:, genes].X)),
        G=jnp.asarray(np.asarray(ad_sp[:, genes].X)),
        d=jnp.asarray(np.asarray(ad_sp.obs["rna_count_based_density"], np.float32)),
    )
    lw = LossWeights(lambda_g1=1.0, lambda_d=1.0)
    M0 = init_logits(n_cells, n_spots, random_state=42, method="auto")

    epochs = 60 if quick else 300
    with tempfile.TemporaryDirectory() as ckpt_dir:
        # simulate preemption: run a third, "crash", resume to completion
        checkpoint.train_checkpointed(
            M0, data, lw, epochs // 3, 0.1,
            checkpoint_dir=ckpt_dir, checkpoint_every=epochs // 3, mesh=mesh,
        )
        print(f"...preempted at epoch {checkpoint.latest_epoch(ckpt_dir)}")
        params, history = checkpoint.train_checkpointed(
            M0, data, lw, epochs, 0.1,
            checkpoint_dir=ckpt_dir, checkpoint_every=epochs // 3, mesh=mesh,
        )
    print(
        f"resumed to epoch {len(history['total_loss'])}, "
        f"final loss {history['total_loss'][-1]:.4f}"
    )


if __name__ == "__main__":
    main()
