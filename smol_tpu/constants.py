"""Global constants.

Mirrors the reference's constants (smol/constants.py:4, smol/cofe/space/constants.py:9).
"""

kB = 8.617333262145e-5  # Boltzmann constant in eV/K (2018 CODATA)

SITE_TOL = 1e-6  # absolute tolerance for fractional-coordinate site matching
