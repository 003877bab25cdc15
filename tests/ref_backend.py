"""ctypes harness around the *compiled reference* plmDCA backend.

The reference C++ backend (``/root/reference/pydca/plmdca``) is self-contained
(it reads the FASTA itself), so we compile it once into /tmp and drive it as a
black-box oracle for parity tests and as the wall-clock baseline.  No reference
code is vendored into this repository — only invoked.
"""

import ctypes
import os
import subprocess

import numpy as np

SO_PATH = "/tmp/refbackend/_plmdcaBackend.so"
REF = "/root/reference/pydca/plmdca"


def build():
    if os.path.exists(SO_PATH):
        return SO_PATH
    os.makedirs(os.path.dirname(SO_PATH), exist_ok=True)
    cmd = [
        "g++", "-std=c++11", "-O3", "-fopenmp", "-fPIC", "-shared",
        f"-I{REF}",
        f"{REF}/plmdcaBackend.cpp",
        f"{REF}/plmdca_numerics.cpp",
        f"{REF}/lbfgs/lib/lbfgs.cpp",
        f"-I{REF}/lbfgs/include",
        "-o", SO_PATH,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return SO_PATH


def run_backend(
    msa_file,
    biomolecule,
    seqs_len,
    seqid=0.8,
    lambda_h=None,
    lambda_J=None,
    max_iterations=100,
    num_threads=1,
    verbose=False,
):
    """Run the reference backend; returns the flat float32 (h, J) vector."""
    build()
    lib = ctypes.CDLL(SO_PATH)
    q = 21 if biomolecule.upper() == "PROTEIN" else 5
    bio_int = 1 if biomolecule.upper() == "PROTEIN" else 2
    if lambda_h is None:
        lambda_h = 0.2 * (seqs_len - 1)
    if lambda_J is None:
        lambda_J = 0.2 * (seqs_len - 1)
    size = seqs_len * q + seqs_len * (seqs_len - 1) * q * q // 2
    fn = lib.plmdcaBackend
    fn.argtypes = (
        ctypes.c_ushort, ctypes.c_ushort, ctypes.c_char_p, ctypes.c_uint,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_uint,
        ctypes.c_uint, ctypes.c_bool,
    )
    fn.restype = ctypes.POINTER(ctypes.c_float * size)
    ptr = fn(
        bio_int, q, str(msa_file).encode(), seqs_len,
        seqid, lambda_h, lambda_J, max_iterations, num_threads, verbose,
    )
    out = np.frombuffer(ptr.contents, dtype=np.float32).copy()
    free = lib.freeFieldsAndCouplings
    free.restype = None
    free(ctypes.cast(ptr, ctypes.POINTER(ctypes.c_void_p)))
    return out
