"""Physical constants shared across the dynamics stack.

Reference parity: the gravitational constant is defined twice upstream with the
same value (gym_space/helpers.py:19 and gym_space/planet.py:5). We keep a single
definition.
"""

# Gravitational constant [m^3 kg^-1 s^-2] (reference: gym_space/helpers.py:19).
G = 6.6743e-11
