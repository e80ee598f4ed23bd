"""Pin the CPU comparator: TF1-style graph-mode residual eval vs JAX-CPU.

BASELINE.md names "the TF1 script run on CPU" as the comparator for the
wall-clock-to-target metric, but the reference cannot run here: it needs
tf.contrib.opt.ScipyOptimizerInterface (removed in TF2; only TF2 is
installed) and pyDOE (absent; installs are forbidden).  This script measures
the honest stand-in conversion factor instead: the SAME mixed-variable
residual loss+gradient evaluation — tanh MLP [3]+8x[70]+[5], plane-stress
constitutive + momentum residuals with nested tf.gradients, exactly the
reference's computational pattern (/root/reference/PlateHoleQuarter/train/
train.py:308-320,390-437) — built twice:

  (a) TF1-compat graph + session.run on CPU (the reference's runtime), and
  (b) this repo's JAX ops, jitted on CPU.

Per-point rates from identical batches give the TF1->JAX-CPU factor; bench.py
measures TPU vs JAX-CPU, so TPU vs TF1-CPU = product of the two.  Nothing is
copied from the reference: the TF graph below is written from the PDE.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = 8192
E, MU, RHO = 20.0, 0.25, 1.0
LAYERS = [3] + 8 * [70] + [5]


def tf1_rate():
    import tensorflow as tf

    tf1 = tf.compat.v1
    tf1.disable_eager_execution()
    tf1.reset_default_graph()

    rng = np.random.default_rng(0)
    Ws, bs = [], []
    for i in range(len(LAYERS) - 1):
        w = rng.normal(0, np.sqrt(2.0 / (LAYERS[i] + LAYERS[i + 1])),
                       (LAYERS[i], LAYERS[i + 1]))
        Ws.append(tf1.Variable(w, dtype=tf.float32))
        bs.append(tf1.Variable(np.zeros((1, LAYERS[i + 1])), dtype=tf.float32))

    x = tf1.placeholder(tf.float32, (None, 1))
    y = tf1.placeholder(tf.float32, (None, 1))
    t = tf1.placeholder(tf.float32, (None, 1))

    h = tf.concat([x, y, t], axis=1)
    for W, b in zip(Ws[:-1], bs[:-1]):
        h = tf.tanh(tf.matmul(h, W) + b)
    out = tf.matmul(h, Ws[-1]) + bs[-1]
    u, v, s11, s22, s12 = (out[:, i:i + 1] for i in range(5))

    # Kinematics + constitutive (plane stress) + momentum, nested gradients —
    # the reference's pattern (first-order AD for strains/stress-divergence,
    # second-order in t for acceleration).
    u_x = tf1.gradients(u, x)[0]
    v_y = tf1.gradients(v, y)[0]
    u_y = tf1.gradients(u, y)[0]
    v_x = tf1.gradients(v, x)[0]
    e11, e22, e12 = u_x, v_y, u_y + v_x
    c = E / (1 - MU * MU)
    f_s11 = s11 - c * (e11 + MU * e22)
    f_s22 = s22 - c * (e22 + MU * e11)
    f_s12 = s12 - c * (1 - MU) / 2 * e12
    s11_x = tf1.gradients(s11, x)[0]
    s12_y = tf1.gradients(s12, y)[0]
    s22_y = tf1.gradients(s22, y)[0]
    s12_x = tf1.gradients(s12, x)[0]
    u_t = tf1.gradients(u, t)[0]
    v_t = tf1.gradients(v, t)[0]
    u_tt = tf1.gradients(u_t, t)[0]
    v_tt = tf1.gradients(v_t, t)[0]
    f_u = s11_x + s12_y - RHO * u_tt
    f_v = s22_y + s12_x - RHO * v_tt

    loss = sum(tf.reduce_mean(tf.square(r))
               for r in (f_s11, f_s22, f_s12, f_u, f_v))
    grads = tf1.gradients(loss, Ws + bs)

    pts = rng.uniform(0, 1, (N, 3)).astype(np.float32)
    feed = {x: pts[:, :1], y: pts[:, 1:2], t: pts[:, 2:3]}
    with tf1.Session() as sess:
        sess.run(tf1.global_variables_initializer())
        sess.run([loss] + grads, feed)  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(3):
                sess.run([loss] + grads, feed)
            best = min(best, (time.perf_counter() - t0) / 3)
    return N / best, best, pts


def jax_rate(pts):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pinn_elastodynamics_tpu.models.fields import (
        FieldSpec,
        MLPFieldModel,
        SECOND_ORDER,
    )
    from pinn_elastodynamics_tpu.ops import residuals as res_ops
    from pinn_elastodynamics_tpu.ops.elasticity import Material, PLANE_STRESS

    model = MLPFieldModel(
        spec=FieldSpec(ndim=2, formulation=SECOND_ORDER), hidden=(70,) * 8
    )
    params = model.init(jax.random.PRNGKey(0), jnp.float32)
    mat = Material(E=E, mu=MU, rho=RHO)
    xyt = jnp.asarray(pts)

    def loss_fn(p):
        jet = model.jet(p, xyt)
        res = res_ops.residuals(jet, model.spec, mat, PLANE_STRESS)
        return sum(jnp.mean(jnp.square(r)) for r in res.values())

    vg = jax.jit(jax.value_and_grad(loss_fn))
    jax.block_until_ready(vg(params))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(3):
            jax.block_until_ready(vg(params))
        best = min(best, (time.perf_counter() - t0) / 3)
    return N / best, best


def main():
    tf_r, tf_s, pts = tf1_rate()
    jx_r, jx_s = jax_rate(pts)
    print({
        "n_points": N,
        "tf1_compat_evals_per_sec": round(tf_r, 1),
        "tf1_step_seconds": round(tf_s, 4),
        "jax_cpu_evals_per_sec": round(jx_r, 1),
        "jax_cpu_step_seconds": round(jx_s, 4),
        "jax_cpu_over_tf1": round(jx_r / tf_r, 2),
    })


if __name__ == "__main__":
    main()
