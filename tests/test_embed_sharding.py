"""SPMD hygiene of the shared-embedding lookup under tensor parallelism.

MULTICHIP_r03.json's tail was a wall of XLA "Involuntary full
rematerialization" warnings on the vocab-sharded ``shared`` gather
(op_name ``…/shared/jit(_take)/gather``): the SPMD partitioner replicated
the whole (vocab, d_model) table on every token-embedding take.
``embed_tokens`` (models/t5.py) replaces the gather with a one-hot matmul
whenever the ambient mesh's ``tensor`` axis is nontrivial. These tests pin
both properties:

  * numerics — the one-hot lookup is bit-exact with the gather on the same
    mesh (each output element is a single product by an exact 1.0; adding
    the remaining exact zeros cannot perturb it);
  * the warning itself — compiling the train grad on the dry-run mesh
    geometry (fsdp=tensor=seq=2) in a subprocess emits the involuntary-
    rematerialization warning with the lookup forced back to the plain
    gather and stays silent with the fix, so the differential isolates
    exactly the regression the r3 driver artifact recorded.
"""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

import klab_multimodalmodel_tpu.models.t5 as t5_mod
from klab_multimodalmodel_tpu.config import T5Size
from klab_multimodalmodel_tpu.parallel.partitioning import spec_for_path
from klab_multimodalmodel_tpu.utils import make_mesh

SIZE = T5Size(d_model=32, d_kv=8, d_ff=64, num_layers=2,
              num_decoder_layers=2, num_heads=4, vocab_size=128,
              relative_attention_num_buckets=8,
              relative_attention_max_distance=16, dropout_rate=0.0)

REMAT_WARNING = "Involuntary full rematerialization"

# Compile the training grad of a tiny T5 on the dryrun_multichip mesh
# (1 data x 2 fsdp x 2 tensor x 2 seq) with params sharded by the standard
# rules. argv[1] selects the lookup: "onehot" leaves embed_tokens alone,
# "gather" forces the plain nn.Embed take (the r3 behavior).
_PROBE = """
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
import klab_multimodalmodel_tpu.models.t5 as t5_mod
from klab_multimodalmodel_tpu.config import T5Size
from klab_multimodalmodel_tpu.models.t5 import T5ForConditionalGeneration
from klab_multimodalmodel_tpu.parallel.partitioning import (
    make_param_specs, make_shardings)
from klab_multimodalmodel_tpu.utils import make_mesh

if sys.argv[1] == "gather":
    t5_mod.embed_tokens = lambda e, i: e(i)
SIZE = T5Size(d_model=32, d_kv=8, d_ff=64, num_layers=2,
              num_decoder_layers=2, num_heads=4, vocab_size=512,
              relative_attention_num_buckets=8,
              relative_attention_max_distance=16, dropout_rate=0.0)
rng = np.random.RandomState(0)
ids = jnp.asarray(rng.randint(3, 512, (8, 48)))
mask = jnp.asarray((rng.rand(8, 48) > 0.2).astype(np.float32))
labels = jnp.asarray(rng.randint(3, 512, (8, 24)))
model = T5ForConditionalGeneration(SIZE)
params = model.init(jax.random.PRNGKey(0), input_ids=ids,
                    attention_mask=mask, labels=labels)["params"]
mesh = make_mesh((1, 2, 2, 2, 1, 1))
ps = jax.device_put(params, make_shardings(make_param_specs(params), mesh))

def loss_fn(p):
    return model.apply({"params": p}, input_ids=ids, attention_mask=mask,
                       labels=labels).loss

with mesh:
    jax.jit(jax.grad(loss_fn)).lower(ps).compile()
print("COMPILED_OK")
"""


def _probe(mode: str) -> str:
    env = dict(os.environ)
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))) + os.pathsep + env.get("PYTHONPATH", ""))
    # The probe sets its own platform/device-count; drop inherited ones.
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run([sys.executable, "-c", _PROBE, mode], env=env,
                       capture_output=True, text=True, timeout=540)
    assert r.returncode == 0 and "COMPILED_OK" in r.stdout, (
        f"probe({mode}) failed rc={r.returncode}:\n{r.stderr[-2000:]}")
    return r.stderr


def test_no_involuntary_remat_on_shared_embedding():
    """The r3 regression and its fix, as a stderr differential: forcing the
    plain gather reproduces XLA's involuntary-full-rematerialization warning
    on the ``shared`` lookup; the shipped one-hot path compiles silently."""
    gather_err = _probe("gather")
    assert REMAT_WARNING in gather_err, (
        "plain gather no longer triggers the remat warning on this "
        "geometry — the differential no longer isolates the fix")
    assert "shared/jit(_take)/gather" in gather_err, (
        "the warning moved off the shared-embedding lookup")
    onehot_err = _probe("onehot")
    assert REMAT_WARNING not in onehot_err, (
        f"embed_tokens still rematerializes:\n{onehot_err[-2000:]}")


def test_embed_tokens_bitexact_with_gather_on_same_mesh():
    """One-hot lookup == gather, bitwise, under the same tensor-sharded
    table (single product by exact 1.0 + exact zeros)."""
    import flax.linen as nn
    from jax.sharding import NamedSharding

    class Wrap(nn.Module):
        onehot: bool

        @nn.compact
        def __call__(self, ids):
            emb = nn.Embed(SIZE.vocab_size, SIZE.d_model, name="shared")
            if self.onehot:
                return t5_mod.embed_tokens(emb, ids)
            return emb(ids)

    rng = np.random.RandomState(1)
    ids = jnp.asarray(rng.randint(0, SIZE.vocab_size, (4, 16)))
    table = jnp.asarray(rng.randn(SIZE.vocab_size, SIZE.d_model),
                        jnp.float32)
    mesh = make_mesh((2, 2, 2, 1, 1, 1))
    sharding = NamedSharding(mesh, P("tensor", "fsdp"))
    p = {"params": {"shared": {"embedding": jax.device_put(table,
                                                           sharding)}}}
    with mesh:
        hot = jax.jit(lambda v, i: Wrap(True).apply(v, i))(p, ids)
        plain = jax.jit(lambda v, i: Wrap(False).apply(v, i))(p, ids)
    np.testing.assert_array_equal(np.asarray(hot), np.asarray(plain))
    np.testing.assert_array_equal(np.asarray(hot),
                                  np.asarray(table)[np.asarray(ids)])


def test_embed_tokens_onehot_uses_highest_precision():
    """ADVICE r4 (medium): the TPU default matmul precision would truncate
    a float32 table to bf16 inside the one-hot dot_general — breaking the
    bit-exactness contract on hardware even though CPU tests (where f32
    dots are exact at any setting) can't observe it. Pin the T5X idiom:
    the lookup dot_general must carry Precision.HIGHEST in the trace."""
    import flax.linen as nn

    class Wrap(nn.Module):
        @nn.compact
        def __call__(self, ids):
            emb = nn.Embed(SIZE.vocab_size, SIZE.d_model, name="shared")
            return t5_mod.embed_tokens(emb, ids)

    ids = jnp.zeros((2, 4), jnp.int32)
    p = {"params": {"shared": {"embedding": jnp.zeros(
        (SIZE.vocab_size, SIZE.d_model), jnp.float32)}}}
    mesh = make_mesh((2, 2, 2, 1, 1, 1))
    with mesh:
        jaxpr = str(jax.make_jaxpr(lambda v, i: Wrap().apply(v, i))(p, ids))
    assert "dot_general" in jaxpr and "HIGHEST" in jaxpr, (
        f"one-hot embed lookup lost Precision.HIGHEST:\n{jaxpr[-1500:]}")


def test_embed_tokens_gather_fallback_off_mesh():
    """Without an ambient tensor axis the lookup IS the plain gather —
    single-chip and DP/FSDP compilations unchanged."""
    import flax.linen as nn

    class Wrap(nn.Module):
        @nn.compact
        def __call__(self, ids):
            emb = nn.Embed(SIZE.vocab_size, SIZE.d_model, name="shared")
            return t5_mod.embed_tokens(emb, ids)

    rng = np.random.RandomState(2)
    ids = jnp.asarray(np.arange(8).reshape(2, 4))
    table = jnp.asarray(rng.randn(SIZE.vocab_size, SIZE.d_model),
                        jnp.float32)
    p = {"params": {"shared": {"embedding": table}}}
    got = Wrap().apply(p, ids)
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(table)[np.asarray(ids)])
    # And the sharding rules still vocab-shard the table (precondition of
    # the remat differential above).
    assert spec_for_path("shared/embedding", 2) == P("tensor", "fsdp")
