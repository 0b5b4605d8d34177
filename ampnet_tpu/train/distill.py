"""In-step knowledge distillation: frozen teacher forwards fused into the
student's jitted train step.

TPU-shaped design: instead of precomputing soft labels offline (a second
dataset pass, host storage, and an alignment problem once augmentation moves
the points), the teacher runs INSIDE the compiled train step on the exact
augmented batch the student sees — one program, no extra host round trips,
and the soft targets are always consistent with the student's view of the
points (shared rotate_z / shuffle / dropout). Teachers are frozen: their
variables enter the program as constants (``stop_gradient`` on the output),
so the backward pass stores no teacher residuals.

Teachers come from the same comma-separated checkpoint machinery as inference
ensembles (cli/main.py::_restore_variables): same-signature members stack and
vmap on a model axis; cross-family groups (attention + GRU) each run once and
average — the ensemble that measured best on the hard benchmark (BASELINE.md)
can distill into a single student. The encoders are per-point MLPs + pooling,
so a teacher accepts the student's (W, N) geometry regardless of its own
training geometry.

No reference counterpart — the closest mechanism is the GRU trainer's
latent-weight reuse (pointNet/pointnetAtt.py:212-258), a weight-transfer
scheme, not a teacher objective.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def make_teacher_fn(
    groups: Sequence[Tuple],  # [(cfg, model, variables_or_list), ...]
    temperature: float = 1.0,
) -> Callable:
    """Build ``teacher_probs(points, centroids, pad_mask, point_mask) ->
    [..., C]``: tempered softmax probabilities averaged over every teacher
    member (stacked groups under vmap, cross-family groups summed), with the
    gradient stopped. Call it inside a jitted step — the teacher variables
    trace as constants."""
    entries = []
    total = 0
    for g_cfg, model, variables in groups:
        if isinstance(variables, (list, tuple)):
            if len(variables) == 1:
                variables, m = variables[0], 1
            else:
                m = len(variables)
                variables = jax.tree.map(
                    lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                    *variables,
                )
        else:
            m = 1
        # per-group input width: a --geom_features teacher reads the 6 extra
        # eigenfeature columns while a plain co-teacher (or the student) reads
        # only the first 9 — the batch carries the WIDEST schema and each
        # consumer slices its own prefix (canonical column order, geom cols
        # appended last: preproc/geomfeat.py)
        width = int(g_cfg.data.num_features + g_cfg.data.extra_features)
        entries.append((model, variables, m, width))
        total += m
    if total == 0:
        raise ValueError("distillation teacher needs at least one member")

    def teacher_probs(
        points: jnp.ndarray,
        centroids: Optional[jnp.ndarray],
        pad_mask: Optional[jnp.ndarray],
        point_mask: Optional[jnp.ndarray],
    ) -> jnp.ndarray:
        t = jnp.float32(temperature)
        acc = 0.0
        for model, variables, m, width in entries:
            if points.shape[-1] < width:
                raise ValueError(
                    f"teacher expects {width} feature columns but the batch "
                    f"carries {points.shape[-1]} — train on a dataset "
                    "preprocessed with the teacher's --geom_features setting"
                )
            pts = points[..., :width]

            def one(v, _m=model, _p=pts):
                logits, _, _ = _m.apply(
                    v, _p, centroids, pad_mask, point_mask, train=False
                )
                return jax.nn.softmax(logits.astype(jnp.float32) / t, axis=-1)

            acc = acc + (jax.vmap(one)(variables).sum(0) if m > 1 else one(variables))
        return jax.lax.stop_gradient(acc / total)

    return teacher_probs
