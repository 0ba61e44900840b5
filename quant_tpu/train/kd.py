"""Knowledge-distillation criterion (reference quant/utils/kd_criterion.py).

loss = KL(softmax(student/T) || softmax(teacher/T)) * T^2, summed over
classes, averaged over the batch.

`teacher_correction` note: the reference intends to fall back to plain
cross-entropy on examples the teacher misclassifies, but its mask compares
the teacher's prediction to ITSELF (kd_criterion.py:46), so the correction
is a no-op — and the published numbers were produced WITH that bug
(SURVEY.md "known quirks"). We reproduce the reference behavior by default
(`fixed_teacher_correction=False`); setting the fix flag enables the
intended semantics (compare teacher prediction to the true target).
"""

import jax
import jax.numpy as jnp


def kd_criterion(output_student: jax.Array,
                 output_teacher: jax.Array,
                 target: jax.Array,
                 temperature: float,
                 freeze_teacher: bool = True,
                 teacher_correction: bool = True,
                 fixed_teacher_correction: bool = False) -> jax.Array:
    """KD loss over raw logits of student and teacher."""
    t = temperature
    teacher_val = (jax.lax.stop_gradient(output_teacher)
                   if freeze_teacher else output_teacher)

    log_p_student = jax.nn.log_softmax(output_student / t, axis=1)
    p_teacher = jax.nn.softmax(teacher_val / t, axis=1)
    log_p_teacher = jax.nn.log_softmax(teacher_val / t, axis=1)
    kd = jnp.sum(p_teacher * (log_p_teacher - log_p_student), axis=1) * (t * t)

    if teacher_correction and fixed_teacher_correction:
        pred_teacher = jnp.argmax(teacher_val, axis=1)
        correct = (pred_teacher == target)
        logp = jax.nn.log_softmax(output_student, axis=1)
        ce = -jnp.take_along_axis(logp, target[:, None], axis=1)[:, 0]
        total = jnp.where(correct, kd, ce)
    else:
        # Reference behavior: the correction mask is identically true
        # (kd_criterion.py:46), so the loss is pure KD.
        total = kd

    return jnp.mean(total)
