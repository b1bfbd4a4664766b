"""ContrastiveProsthetics-TPU: a TPU-native (JAX/XLA/Pallas/pjit) rebuild of
the FibonacciDude/ContrastiveProsthetics contrastive sEMG grasp classifier.

Capability-parity with the reference (CLIP-style contrastive training between
an sEMG encoder and a class encoder on Ninapro DB2/DB3), redesigned TPU-first:
the whole dataset is a device-resident tensor, batching is pure index math,
and every hot loop of the reference (per-item cross-entropy, majority-voting
prefix loop, DataLoader-driven gathers) is a single jitted XLA graph.
"""

from contrastiveprosthetics_tpu.config import Config, DEFAULT_CONFIG

__version__ = "0.1.0"

__all__ = ["Config", "DEFAULT_CONFIG", "__version__"]
