"""Dump the real encoder banks used by pallas_kernel_check to an npz so
the candidate-bin threshold can be analyzed host-side (debug aid)."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pallas_kernel_check import encoder_banks  # noqa: E402

mk, mv, q = encoder_banks("weights/prop_synthetic.npz", n_frames=13)
np.savez("/tmp/banks.npz", mk=np.asarray(mk, np.float32),
         mv=np.asarray(mv, np.float32), q=np.asarray(q, np.float32))
print("saved", mk.shape, mv.shape, q.shape)
