"""Precision policy.

TPU MXUs natively consume bfloat16; params and optimizer state stay float32.
The reference is float32 throughout (PyTorch default). Policy:

- ``f32``: everything float32 (default; matches reference numerics —
  required for the MSE-parity targets in BASELINE.md),
- ``bf16``: activations/compute bfloat16, params + metrics float32
  (benchmark mode; rides the MXU at full rate).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Precision:
    name: str = "f32"

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.name == "bf16" else jnp.float32

    @property
    def param_dtype(self):
        return jnp.float32

    def cast_in(self, x):
        return x.astype(self.compute_dtype)

    def cast_out(self, x):
        return x.astype(jnp.float32)


def resolve_dtype(name: str):
    return {"f32": jnp.float32, "bf16": jnp.bfloat16}[name]


F32 = Precision("f32")
BF16 = Precision("bf16")
