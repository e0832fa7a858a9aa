from .params import CKKSConfig, CKKSContext, PROFILES
from .scheme import Scheme, Ciphertext, Plaintext
