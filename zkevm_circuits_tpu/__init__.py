"""zkevm_circuits_tpu — TPU-native zkEVM circuit-evaluation framework.

A from-scratch rebuild, on JAX/XLA/Pallas, of the capability surface of
matter-labs/era-zkevm_circuits (plus the slice of `boojum` that repo consumes):
Goldilocks field arithmetic, Poseidon2 sponge queues, the ClosedFormInput
multi-instance continuation protocol, and the 13 base-layer circuit families,
each expressed trace-first as row-parallel witness-generation and
constraint-evaluation kernels.

Layout:
    ops/       field & hash & queue primitives (jnp + Pallas kernels)
    models/    the circuit families (the "model zoo")
    parallel/  mesh construction, sharded scans, multi-chip plumbing
    utils/     protocol glue: closed-form inputs, challenges, config
    isa/       zkevm opcode/system-parameter data (zkevm_opcode_defs port)
"""

__version__ = "0.1.0"
