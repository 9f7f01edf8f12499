"""Generate pinned golden mapping values from the live torch reference.

Reproduces the operating point of the reference's golden regression
(/root/reference/tests/tangram_test.py:67-103: clusters mode, random_state=42,
500 epochs, 9 (lambda_g1, lambda_g2, lambda_d, prior, scale) parametrizations)
on a deterministic synthetic fixture, since the reference's h5ad fixtures are
absent from the snapshot (.MISSING_LARGE_BLOBS).

The goldens pin the optimizer + data-prep numerics so CI catches slow drift
without torch installed. Regenerate with:
    python scripts/gen_goldens.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from _reference import load_reference_optimizer

from tests.test_golden import PARAMS, build_fixture, prep_mapper_inputs

REF = load_reference_optimizer()
assert REF is not None, "torch reference required to (re)generate goldens"


def main():
    ad_sc, ad_sp = build_fixture()
    goldens = []
    for lambda_g1, lambda_g2, lambda_d, prior, scale in PARAMS:
        S, G, d, d_source, lam_d = prep_mapper_inputs(
            ad_sc, ad_sp, prior, scale, lambda_d
        )
        mapper = REF.Mapper(
            S=S, G=G, d=d, d_source=d_source, device="cpu",
            lambda_g1=lambda_g1, lambda_g2=lambda_g2, lambda_d=lam_d,
            random_state=42,
        )
        M, history = mapper.train(learning_rate=0.1, num_epochs=500, print_each=None)
        goldens.append(
            {
                "params": [lambda_g1, lambda_g2, lambda_d, prior, scale],
                "x00": float(M[0, 0]),
                "row0_head": [float(v) for v in M[0, :3]],
                "final_main_loss": float(history["main_loss"][-1]),
            }
        )
        print(goldens[-1])
    out = os.path.join(os.path.dirname(__file__), "..", "tests", "data")
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "golden_mapping.json"), "w") as f:
        json.dump(goldens, f, indent=1)


if __name__ == "__main__":
    main()
