"""Mixed-precision policy for TPU.

The MXU natively consumes bfloat16; activations and matmul inputs run in bf16
while parameters, optimizer state, softmax and norm statistics stay float32.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype
    compute_dtype: jnp.dtype

    def cast_to_compute(self, x):
        return jnp.asarray(x, self.compute_dtype)


_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def get_policy(compute_dtype: str = "bfloat16",
               param_dtype: str = "float32") -> Policy:
    return Policy(param_dtype=_DTYPES[param_dtype],
                  compute_dtype=_DTYPES[compute_dtype])
