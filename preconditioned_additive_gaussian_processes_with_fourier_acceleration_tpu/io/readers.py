"""Readers for the reference's text data formats.

Formats (ref TESTS/TEST4/foo.cpp:9-120):
- features: header "n d" then n*d values, column-major (all of feature 0,
  then feature 1, ...)
- labels:   header "n" then n values
- windows:  header "nwindow dwindow" then column-major feature indices,
  -1 = padding (skip logic nfft_interface.c:630-636)
"""

import numpy as np


def read_features(path):
    with open(path) as f:
        toks = f.read().split()
    n, d = int(toks[0]), int(toks[1])
    vals = np.asarray([float(t) for t in toks[2 : 2 + n * d]])
    return vals.reshape(d, n).T.copy()  # column-major -> (n, d)


def read_labels(path):
    with open(path) as f:
        toks = f.read().split()
    n = int(toks[0])
    return np.asarray([float(t) for t in toks[1 : 1 + n]])


def read_windows(path):
    """Returns a (W, dw) int array with -1 padding."""
    with open(path) as f:
        toks = f.read().split()
    w, dw = int(toks[0]), int(toks[1])
    vals = np.asarray([int(t) for t in toks[2 : 2 + w * dw]], dtype=np.int32)
    return vals.reshape(dw, w).T.copy()
