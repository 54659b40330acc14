"""Checkpoint / resume for keys and ciphertexts.

The reference never serializes anything (SURVEY §5: "no serde"); production
deployments need durable keys and ciphertext stores.  Every object in this
library is a pytree of u64 arrays + static params, so persistence is a
flat npz with a structure manifest.
"""

import io
import json

import numpy as np
import jax
import jax.numpy as jnp


def save_pytree(path: str, tree) -> None:
    leaves, treedef = jax.tree.flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_pytree(path: str, like):
    """Load into the structure of `like` (same pytree shape)."""
    data = np.load(path)
    leaves = [jnp.asarray(data[f"leaf_{i}"])
              for i in range(len([k for k in data.files if k.startswith("leaf_")]))]
    _, treedef = jax.tree.flatten(like)
    return jax.tree.unflatten(treedef, leaves)
