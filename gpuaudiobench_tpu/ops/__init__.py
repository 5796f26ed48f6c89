"""Device compute ops: jitted XLA programs and Pallas TPU kernels.

Every op is a pure function over float32 arrays with static shapes,
jit-compiled once at benchmark setup (the cuFFT-plan / Metal-pipeline
analog). Each workload has an XLA implementation (portable, used for CPU
tests and as the fusion baseline) and, where it pays off, a Pallas TPU
kernel (sequential recurrences with tracks on the 128-wide lane axis,
VMEM-resident stencils).
"""
