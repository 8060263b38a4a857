"""r5: SSD bucket3 candidate-SELECTION cost (0.75 ms of the 4.5 ms NMS
standalone chain — nms_pieces_r4) — race exact-semantics reformulations.

The shipped form (ops/detection.py multiclass_nms_pallas) runs 3 masked
bucket-max passes; each pass selects the max's BOX via a 5-D broadcast
product sum(onehot[..., None] * bx_b, axis=3) over (N, C, loc, bs, 4) —
94M f32 elements per pass if XLA materializes it.

  S0  shipped 3-pass form (re-baseline, code copied verbatim)
  S1  same 3 passes, but the box selection runs per-coordinate:
      4 masked (N, C, loc, bs) sums — no 5-D broadcast
  S2  single-pass running top-3 over the bucket axis (unrolled bs steps,
      first-max tie semantics preserved via strict-greater updates), boxes
      selected per-coordinate from the recorded argmax indices

All variants must produce IDENTICAL (top_s, cand) tensors.  Writes
docs/nms_select_r5.json.
"""
import os, json, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

N, M, C = 32, 8732, 21
LOC, TOPN = 176, 3
BS = -(-M // LOC)          # 50
PAD = LOC * BS - M

rng = np.random.default_rng(0)
scores = rng.uniform(0, 1, (N, M, C)).astype(np.float32)
scores[scores < 0.7] *= 0.01
boxes = rng.uniform(0, 1, (N, M, 4)).astype(np.float32)

sc_d = jax.device_put(jnp.asarray(scores))
bx_d = jax.device_put(jnp.asarray(boxes))


def prep(sc, bx):
    sc_t = sc.transpose(0, 2, 1)
    if PAD:
        sc_t = jnp.pad(sc_t, ((0, 0), (0, 0), (0, PAD)),
                       constant_values=-1e30)
        bx = jnp.pad(bx, ((0, 0), (0, PAD), (0, 0)))
    sc_b = sc_t.reshape(N, C, LOC, BS)
    bx_b = bx.reshape(N, 1, LOC, BS, 4)
    return sc_b, bx_b


@jax.jit
def s0(sc, bx):
    sc_b, bx_b = prep(sc, bx)

    def bucket_max(sb):
        top = sb.max(axis=-1)
        sel = (sb == top[..., None])
        first = jnp.cumsum(sel, axis=-1) == 1
        onehot = (sel & first)
        cnd = jnp.sum(onehot.astype(jnp.float32)[..., None] * bx_b, axis=3)
        return top, onehot, cnd

    top_s, taken, cand = bucket_max(sc_b)
    tops, cands = [top_s], [cand]
    for _ in range(TOPN - 1):
        t_i, oh_i, c_i = bucket_max(jnp.where(taken, -jnp.inf, sc_b))
        taken = taken | oh_i
        tops.append(t_i)
        cands.append(c_i)
    return jnp.concatenate(tops, -1), jnp.concatenate(cands, 2)


@jax.jit
def s1(sc, bx):
    sc_b, bx_b = prep(sc, bx)
    bxd = [bx_b[..., 0], bx_b[..., 1], bx_b[..., 2], bx_b[..., 3]]

    def bucket_max(sb):
        top = sb.max(axis=-1)
        sel = (sb == top[..., None])
        first = jnp.cumsum(sel, axis=-1) == 1
        onehot = (sel & first)
        ohf = onehot.astype(jnp.float32)
        cnd = jnp.stack([jnp.sum(ohf * d, axis=-1) for d in bxd], axis=-1)
        return top, onehot, cnd

    top_s, taken, cand = bucket_max(sc_b)
    tops, cands = [top_s], [cand]
    for _ in range(TOPN - 1):
        t_i, oh_i, c_i = bucket_max(jnp.where(taken, -jnp.inf, sc_b))
        taken = taken | oh_i
        tops.append(t_i)
        cands.append(c_i)
    return jnp.concatenate(tops, -1), jnp.concatenate(cands, 2)


@jax.jit
def s2(sc, bx):
    sc_b, bx_b = prep(sc, bx)
    big = jnp.int32(BS)
    iot = jax.lax.broadcasted_iota(jnp.int32, sc_b.shape, 3)
    NEG = jnp.float32(-jnp.inf)
    m = [jnp.full(sc_b.shape[:3], NEG)] * TOPN
    ix = [jnp.full(sc_b.shape[:3], big)] * TOPN
    m, ix = list(m), list(ix)
    for b in range(BS):
        v = sc_b[..., b]
        i = jnp.int32(b)
        for t in range(TOPN):
            better = v > m[t]
            m[t], v = jnp.where(better, v, m[t]), jnp.where(better, m[t], v)
            ni = jnp.where(better, i, ix[t])
            i = jnp.where(better, ix[t], i)
            ix[t] = ni
    tops = jnp.concatenate(m, -1)
    cands = []
    for t in range(TOPN):
        oh = (iot == ix[t][..., None]).astype(jnp.float32)
        cands.append(jnp.stack(
            [jnp.sum(oh * bx_b[..., d], axis=-1) for d in range(4)], -1))
    return tops, jnp.concatenate(cands, 2)


ref_s, ref_c = jax.device_get(s0(sc_d, bx_d))
for name, fn in (("S1", s1), ("S2", s2)):
    ts, tc = jax.device_get(fn(sc_d, bx_d))
    assert np.array_equal(ts, ref_s), f"{name} scores differ"
    assert np.array_equal(tc, ref_c), f"{name} cands differ"
    print(f"{name}: identical outputs", flush=True)


def timeit(label, fn):
    @jax.jit
    def looped(s, b, iters):
        def body(i, carry):
            ss, bb = carry
            ts, tc = fn(ss, bb)
            t = jnp.sum(jnp.square(ts[:, :1]))
            bump = (t > jnp.float32(3e38)).astype(jnp.float32)
            return ss + bump, bb + bump
        f = jax.lax.fori_loop(0, iters, body, (s, b))
        return jnp.sum(f[0][0, :1, 0])

    def t(it):
        t0 = time.perf_counter()
        float(jax.device_get(looped(sc_d, bx_d, jnp.int32(it))))
        return time.perf_counter() - t0

    t(1)
    loop = 64
    while True:
        d = float(np.median([t(1 + loop) - t(1) for _ in range(3)]))
        if d >= 0.4 or loop >= 1 << 18:
            break
        loop = min(max(int(loop * 0.4 * 1.3 / max(d, 1e-4)) + 1, loop * 2),
                   1 << 18)
    d = float(np.median([t(1 + loop) - t(1) for _ in range(5)]))
    ms = d / loop * 1e3
    print(f"{label}: {ms:.3f} ms", flush=True)
    return round(ms, 3)


results = {}
for name, fn in (("S0_shipped", s0), ("S1_per_coord", s1),
                 ("S2_single_pass", s2)):
    results[name] = timeit(name, fn)

out = "/root/repo/docs/nms_select_r5.json"
json.dump(results, open(out, "w"), indent=1)
print("wrote", out, flush=True)
