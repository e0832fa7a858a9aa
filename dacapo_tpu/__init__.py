"""dacapo_tpu: a TPU-native CKKS FHE compiler and runtime.

Brand-new implementation with the capabilities of the Hecate/DaCapo reference
(corelab-src/dacapo): tracing frontend, scale-management + bootstrapping
placement compiler, and — unlike the reference, which delegates cryptography
to SEAL/HEaaN — a from-scratch RNS/NTT crypto layer running on TPU via
JAX/XLA/Pallas.
"""

__version__ = "0.1.0"
