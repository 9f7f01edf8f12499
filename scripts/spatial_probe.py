"""Round-4 experiment: full spatial-regularizer stack step time at 50k spots.

Usage: python scripts/spatial_probe.py [n_cells] [n_spots]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

n_cells = int(sys.argv[1]) if len(sys.argv) > 1 else 26_000
n_spots = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import pandas as pd

from bench import make_problem, step_time
from tangram_tpu import adlite
from tangram_tpu.ops.losses import LossWeights, spatial_local_indicators
from tangram_tpu.spatial import neighbor_graph, spatial_neighbors
from tangram_tpu.utils import one_hot_encoding

rng = np.random.default_rng(0)
kwargs = dict(moment_dtype="bfloat16", compute_dtype="bfloat16")

ad_sp = adlite.AnnData(
    X=np.ones((n_spots, 1), np.float32),
    obs=pd.DataFrame(index=np.arange(n_spots).astype(str)),
)
ad_sp.obsm["spatial"] = rng.random((n_spots, 2)) * 1000
spatial_neighbors(ad_sp, n_neighs=6)
voxel_graph = neighbor_graph(ad_sp, standardized=True, self_inclusion=True)
nb_filter = neighbor_graph(ad_sp, standardized=False, self_inclusion=False)
autocorr_graph = neighbor_graph(ad_sp, standardized=True, self_inclusion=False)
# NOTE: when Getis-Ord is active the reference overwrites the shared
# spatial-weights slot with its (standardized=False, self_inclusion=True)
# variant (mapping.py _GRAPH_RECIPES); this probe exercises the Moran/Geary
# graph, which is what the bench's spatial legs time.

n_types = 24
ct = pd.Series(rng.choice([f"t{i}" for i in range(n_types)], n_cells))
ct_encode = jnp.asarray(one_hot_encoding(ct).values)

base = make_problem(rng, n_cells, n_spots)

# plain
lw0 = LossWeights(lambda_g1=1.0, lambda_d=1.0)
ms0 = step_time(base, lw0, n_cells, n_spots, steps=50, impl="pallas", **kwargs)
print(f"plain                      : {ms0:7.2f} ms/step", flush=True)

# two-term leg (round-3 bench's config)
lw2 = LossWeights(lambda_g1=1.0, lambda_d=1.0, lambda_neighborhood_g1=0.5,
                  lambda_geary=0.3)
_, _, geary_ref = spatial_local_indicators(base.G, autocorr_graph, lw2)
d2 = base._replace(voxel_weights=voxel_graph, spatial_weights=autocorr_graph,
                   geary_ref=jnp.asarray(geary_ref))
ms2 = step_time(d2, lw2, n_cells, n_spots, steps=50, impl="pallas", **kwargs)
print(f"neighborhood+geary         : {ms2:7.2f} ms/step ({ms2/ms0:.2f}x)",
      flush=True)

# full stack: neighborhood + ct islands + getis + moran + geary
lw5 = LossWeights(
    lambda_g1=1.0, lambda_d=1.0, lambda_neighborhood_g1=0.5,
    lambda_ct_islands=0.3, lambda_getis_ord=0.3, lambda_moran=0.3,
    lambda_geary=0.3,
)
getis_ref, moran_ref, geary_ref = spatial_local_indicators(
    base.G, autocorr_graph, lw5
)
d5 = base._replace(
    voxel_weights=voxel_graph, neighborhood_filter=nb_filter,
    ct_encode=ct_encode, spatial_weights=autocorr_graph,
    getis_ord_ref=jnp.asarray(getis_ref), moran_ref=jnp.asarray(moran_ref),
    geary_ref=jnp.asarray(geary_ref),
)
ms5 = step_time(d5, lw5, n_cells, n_spots, steps=50, impl="pallas", **kwargs)
print(f"full stack (5 terms + ct)  : {ms5:7.2f} ms/step ({ms5/ms0:.2f}x)",
      flush=True)
