"""Per-op CC costs at 512^3: one propagate pass vs one pointer-jump gather."""

import time

import jax
import jax.numpy as jnp

from skoots_tpu.utils.compile_cache import enable_compilation_cache

N = 512


def timeit(fn, x, n=4):
    @jax.jit
    def loop(x):
        def body(i, v):
            return fn(v)

        return jax.lax.fori_loop(0, n, body, x).max()

    float(loop(x))
    t0 = time.time()
    float(loop(x))
    return (time.time() - t0) / n


def main():
    enable_compilation_cache()
    shape = (N, N, N)
    key = jax.random.PRNGKey(0)
    lab = jax.random.randint(key, shape, 1, N**3, jnp.int32)

    def prop_sep(lab):
        for ax in range(3):
            win = [1, 1, 1]
            win[ax] = 3
            pads = tuple((1, 1) if w == 3 else (0, 0) for w in win)
            lab = jax.lax.reduce_window(
                lab, jnp.int32(0), jax.lax.max, tuple(win), (1, 1, 1), pads
            )
        return lab

    def prop_box(lab):
        return jax.lax.reduce_window(
            lab, jnp.int32(0), jax.lax.max, (3, 3, 3), (1, 1, 1),
            ((1, 1), (1, 1), (1, 1)),
        )

    def jump(lab):
        flat = lab.reshape(-1)
        tgt = jnp.maximum(lab - 1, 0).reshape(-1)
        return flat[tgt].reshape(lab.shape)

    def jump_sorted(lab):
        # best-case gather: identity indices (measures non-randomness cost)
        flat = lab.reshape(-1)
        tgt = jnp.arange(flat.shape[0], dtype=jnp.int32)
        return flat[tgt].reshape(lab.shape) + lab

    print("prop_separable:", round(timeit(prop_sep, lab), 3), "s")
    print("prop_box:      ", round(timeit(prop_box, lab), 3), "s")
    print("jump_random:   ", round(timeit(jump, lab), 3), "s")
    print("jump_identity: ", round(timeit(jump_sorted, lab), 3), "s")


if __name__ == "__main__":
    main()
