"""Training schedules. Cyclic linear beta annealing per
SpaDOT/utils/_train_utils.py:143-153 (10 cycles over maxiter epochs)."""
import numpy as np


def beta_cycle_linear(n_iter, start=0.0, stop=1.0, n_cycle=10, ratio=1.0):
    L = np.ones(n_iter) * stop
    period = n_iter / n_cycle
    step = (stop - start) / (period * ratio)
    for c in range(n_cycle):
        v, i = start, 0
        while v <= stop and (int(i + c * period) < n_iter):
            L[int(i + c * period)] = v
            v += step
            i += 1
    return L
