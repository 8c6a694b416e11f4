"""Model visualisation (reference src/ml_tools/visualise.py): confusion
matrix plots and input-gradient saliency maps (JAX grads instead of the
reference's TF GradientTape)."""

from __future__ import annotations

from pathlib import Path

import numpy as np


def plot_confusion_matrix(cm, labels, out_path, normalize=True):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    cm = np.asarray(cm, np.float64)
    if normalize:
        cm = cm / np.maximum(cm.sum(axis=1, keepdims=True), 1)
    fig, ax = plt.subplots(figsize=(max(6, len(labels) * 0.6),) * 2)
    im = ax.imshow(cm, cmap="Blues")
    ax.set_xticks(range(len(labels)), labels, rotation=90)
    ax.set_yticks(range(len(labels)), labels)
    ax.set_xlabel("predicted")
    ax.set_ylabel("actual")
    for i in range(len(labels)):
        for j in range(len(labels)):
            v = cm[i, j]
            if v > 0.005:
                ax.text(j, i, f"{v:.2f}" if normalize else int(v),
                        ha="center", va="center", fontsize=7,
                        color="white" if v > cm.max() / 2 else "black")
    fig.colorbar(im)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return Path(out_path)


def saliency_map(interpreter, batch):
    """d|best logit|/d input via jax.grad — highlights what drives the
    prediction (reference visualise.py saliency)."""
    import jax
    import jax.numpy as jnp

    def score(x):
        out = interpreter.model.apply(interpreter.variables, x[None], train=False)
        return jnp.max(out[0])

    g = jax.vmap(jax.grad(score))(jnp.asarray(batch, jnp.float32))
    sal = np.abs(np.asarray(g)).max(axis=-1)
    denom = sal.max(axis=(1, 2), keepdims=True)
    return sal / np.maximum(denom, 1e-9)
