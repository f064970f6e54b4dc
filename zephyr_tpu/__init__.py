'''
zephyr_tpu: a TPU-native frequency-domain seismic full-waveform modelling
and inversion framework with the capabilities of uwoseis/zephyr, built on
JAX / XLA / Pallas.

Layers (mirroring the reference's structure; see SURVEY.md):
- zephyr_tpu.ops     — differentiable stencil coefficient builders,
                        matrix-free stencil algebra, special functions
- zephyr_tpu.solver  — multigrid-preconditioned Krylov Helmholtz solves
                        with implicit differentiation
- zephyr_tpu.backend — forward-modelling layer (reference-parity API)
- zephyr_tpu.middleware — inverse-problem layer (Problem/Survey/FWI)
- zephyr_tpu.parallel — device-mesh sharding of frequencies/sources
- zephyr_tpu.frontend — CLI and composable jobs
'''

__version__ = '0.1.0'
