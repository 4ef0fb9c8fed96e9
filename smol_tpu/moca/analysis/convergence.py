"""MC convergence checks (mirrors smol/moca/analysis/convergence.py)."""

from __future__ import annotations

from warnings import warn

import numpy as np

__all__ = ["check_property_converged", "determine_discard_number"]


def check_property_converged(
    property_array, conv_tol=None, min_std=1e-4, last_m=None, verbose=False
) -> bool:
    """Check last-value and cumulative-mean convergence of a property trace.

    Criteria: (1) the last value lies within conv_tol of the mean, and
    (2) the cumulative mean over the last M samples lies within conv_tol of
    the mean.  A tiny standard deviation (< min_std) is treated as converged
    (few acceptances, e.g. at low temperature).
    """
    property_array = np.asarray(property_array)
    std_prop = float(np.std(property_array))
    if std_prop < min_std:
        if verbose:
            print("Property std dev very small; assuming MC is converged.")
        return True
    if conv_tol is None:
        conv_tol = std_prop
    mean_prop = float(np.average(property_array))
    n_samples = len(property_array)
    if last_m is None or last_m > n_samples:
        if last_m is not None:
            warn(
                f"last_m ({last_m}) exceeds the number of samples "
                f"({n_samples}); using the last 10%."
            )
        last_m = int(n_samples / 10)

    converged_last = abs(property_array[-1] - mean_prop) < conv_tol
    if not converged_last and verbose:
        print("The last value of the property is not close to the mean.")
    cum_mean = np.cumsum(property_array) / np.arange(1, n_samples + 1)
    converged_cum = bool(
        np.all(np.abs(cum_mean[-last_m:] - mean_prop) < conv_tol)
    )
    if not converged_cum and verbose:
        print("The cumulative mean does not converge to the global mean.")
    return bool(converged_last and converged_cum)


def determine_discard_number(
    property_array, init_discard=None, increment=10, verbose=False
) -> int:
    """Smallest burn-in discard count for which the remainder is converged."""
    property_array = np.asarray(property_array)
    n_samples = len(property_array)
    if init_discard is None or init_discard > n_samples:
        if init_discard is not None:
            warn(
                f"init_discard ({init_discard}) exceeds the number of samples "
                f"({n_samples}); using 10%."
            )
        init_discard = int(n_samples / 10)
    step = (n_samples - init_discard) / increment
    for discard_n in np.arange(init_discard, n_samples - step, step):
        discard_n = int(discard_n)
        if check_property_converged(property_array[discard_n:]):
            return discard_n
    if verbose:
        print("No discard value leads to convergence; returning 0.")
    return 0
