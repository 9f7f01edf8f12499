"""Load the reference PyTorch optimizer module for numerical-parity testing.

The reference implementation at /root/reference is imported (never copied) so
tests can assert that the JAX rebuild matches its loss values and training
trajectories. Everything degrades to skipped tests when the reference or
torch is unavailable.
"""

import importlib.util
import os

REF_OPTIMIZER = "/root/reference/tangram/mapping_optimizer.py"


def load_reference_optimizer():
    if not os.path.exists(REF_OPTIMIZER):
        return None
    try:
        import torch  # noqa: F401
    except ImportError:
        return None
    spec = importlib.util.spec_from_file_location("ref_mapping_optimizer", REF_OPTIMIZER)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module
