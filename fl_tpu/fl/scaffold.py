"""SCAFFOLD: stochastic controlled averaging for federated learning.

Karimireddy et al. 2020 (arXiv:1910.06378), Algorithm 1, Option II. FedAvg
on heterogeneous clients suffers *client drift*: each client's local steps
follow its own gradient field, so with many local steps the averaged model
is pulled away from the true optimum. SCAFFOLD corrects every local step
with control variates — a server variate ``c`` (estimate of the global
average gradient) and per-client variates ``c_i`` (estimates of each
client's own average gradient):

    local step:   w <- w - lr * (grad + c - c_i)
    after K local SGD steps (Option II):
        c_i+ = c_i - c - (w_local - w_global) / (K * lr)
    server:       c <- c + (1/N) * sum_{i in S} (c_i+ - c_i)

Option II's identity requires the local update to be EXACTLY the sum of
``lr * (corrected grad)``; the engine therefore requires plain SGD
(momentum 0) for SCAFFOLD. The correction itself is one fused add per
step; the control state is a (C, D) client-sharded matrix + a (D,)
replicated vector, carried across rounds like the uplink error-feedback
state and checkpointed with it.

TPU mapping: corrections ride into the vmapped local trainer as one more
stacked operand; the state update is two elementwise matrix ops plus a
single masked column-sum whose cross-shard reduction is the same ``psum``
schedule as FedAvg itself — no new collective pattern on a mesh.

The reference has no heterogeneity correction at all (plain FedAvg,
src/shared/fedavg.py); this is a capability extension alongside FedProx
(fl_tpu.fl.local_training.proximal_mu).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def scaffold_correction(c_flat: jax.Array, ci_mat: jax.Array,
                        spec) -> "jax.Array":
    """Per-client correction ``c - c_i`` as a stacked params tree.

    ``c_flat``: (D_pad,) replicated server variate; ``ci_mat``: (C, D_pad)
    client variates; ``spec``: a :func:`fl_tpu.ops.flatten.stack_flatten`
    spec for the (client-stacked, f32) params tree.
    """
    from fl_tpu.ops.flatten import stack_unflatten

    return stack_unflatten(c_flat[None, :] - ci_mat, spec)


def scaffold_update(
    c_flat: jax.Array,            # (D_pad,) server control variate
    ci_mat: jax.Array,            # (C_local, D_pad) client control variates
    delta_mat: jax.Array,         # (C_local, D_pad) w_local - w_global
    mask: jax.Array,              # (C_local,) participation mask
    k_steps: jax.Array,           # (C_local,) local SGD steps taken
    lr: float,
    num_clients: int,             # global N (not the shard-local count)
    psum: Callable[[jax.Array], jax.Array] = lambda x: x,
) -> Tuple[jax.Array, jax.Array]:
    """One round's control-variate update (Option II). Returns
    ``(new_c, new_ci)``; non-participants keep their ``c_i`` and the
    server moves by the PARTICIPANT sum over the global client count N
    (Karimireddy et al. eq. for |S|/N-weighted c update)."""
    k = jnp.maximum(k_steps.astype(jnp.float32), 1.0)[:, None]
    ci_plus = ci_mat - c_flat[None, :] - delta_mat / (k * lr)
    # a participant that took zero local steps (epoch budget 0) has no
    # trajectory to recover a gradient estimate from — its variate must
    # not move (otherwise it would be dragged by -c for free)
    m = ((mask > 0) & (k_steps > 0)).astype(jnp.float32)[:, None]
    new_ci = jnp.where(m > 0, ci_plus, ci_mat)
    dc = psum(jnp.sum(m * (ci_plus - ci_mat), axis=0))
    new_c = c_flat + dc / float(num_clients)
    return new_c, new_ci
