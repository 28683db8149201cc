"""Pure-Python document kernels.

No Spark imports allowed in this package: every function here runs both
(a) in-driver as the correctness oracle and (b) inside Arrow-vectorized
pandas UDFs on executors. Determinism is a hard requirement — no wall
clock, no uuid4, no unseeded randomness.
"""
