"""Dump the cornell+dragon diffuse-bounce wavefront to /tmp/wave.npz
(CPU) for TPU-side stage timing."""
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/exp")
import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

from union_stats_lib import load, diffuse_wave

RES = int(os.environ.get("RES", "800"))
scene = load(RES)
no, nd, nt0 = diffuse_wave(scene, RES)
np.savez("/tmp/wave.npz", o=no, d=nd, t0=nt0)
print("saved", no.shape)
