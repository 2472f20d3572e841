"""Benchmark: interphase BD hot loop at a 100k-bead nucleus on one chip.

Prints ONE JSON line:
    {"metric": "bead_steps_per_s_per_chip", "value": N, "unit": "bead-steps/s",
     "vs_baseline": R}

The primary metric follows BASELINE.md: bead-steps/s/chip for the full
interphase force field (cell-list A/B softcore, chain bonds, nucleolar
terms, moving ellipsoid wall with reaction, contact counting cadence, BD
update).  ``vs_baseline`` compares against a single-threaded C++ cell-list
implementation of the same force field compiled with -O2 -march=native
(bench_baseline.cpp) — the reference itself cannot be built here because its
micromd submodule is not vendored (SURVEY.md §2.9), so this stands in as the
reference-equivalent CPU baseline; its throughput is cached in
bench_baseline_r25.json after the first run.

Robustness: per-cell capacity is probed from the actual initial structure
(densest cell + headroom) and each variant retries once with doubled
capacity if the run still overflows — an overflowed run measures dropped
pairs, not the force field, and is never reported.
"""

import json
import os
import pathlib
import subprocess
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent
N_BEADS = 100_000
CHAINS = 46
BENCH_STEPS = 200
# Equilibrium-G1-like density: 100k beads in a radius-2.5 ball (~1500/unit^3,
# ~40 beads per 0.3 cell).  The C++ baseline uses the same configuration.
BALL_RADIUS = 2.5
BASELINE_CACHE = REPO / "bench_baseline_r25.json"


def _probe_capacity(x, cell_size, margin=1.25):
    """Densest-cell occupancy of the start structure, with headroom,
    rounded up to a multiple of 32 (slab engines want static capacity; the
    Pallas kernel wants a multiple of its j-sublane block)."""
    coords = np.floor(x / cell_size).astype(np.int64)
    coords -= coords.min(axis=0)
    dims = coords.max(axis=0) + 1
    cid = (coords[:, 0] * dims[1] + coords[:, 1]) * dims[2] + coords[:, 2]
    max_fill = int(np.bincount(cid).max())
    return int(max(32, -(-int(max_fill * margin) // 32) * 32))


def _measure_variant(use_pallas, use_dense):
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, str(REPO))
    import __graft_entry__ as ge
    from genome_cycle_tpu.models.interphase import EngineSettings

    x_host = ge._ball(N_BEADS, radius=BALL_RADIUS)
    cell_size = 0.3  # max core diameter (reference interphase defaults)
    capacity = _probe_capacity(x_host, cell_size)

    for attempt in range(3):
        settings = EngineSettings(
            cell_capacity=capacity,
            contact_capacity=64,
            grid_bound=BALL_RADIUS + 1.0,
            dense_bound=BALL_RADIUS + 0.5,
            use_dense_grid=use_dense,
            use_pallas=use_pallas,
        )
        model = ge._make_model(n_beads=N_BEADS, chains=CHAINS, settings=settings)

        x = jnp.asarray(x_host[: model.n])
        key = jax.random.PRNGKey(0)
        # Wall semiaxes match the start ball: density stays at the stated
        # ~1500 beads/unit^3 instead of compressing mid-measurement (the C++
        # baseline uses the same geometry).
        semiaxes = jnp.full((3,), BALL_RADIUS, jnp.float32)
        contact = model.fresh_contact_list(x, float(model.scales(0.0)[0]))
        stats = (jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
        carry = (x, key, semiaxes, contact, stats)

        chunk = jax.jit(
            lambda carry, start: jax.lax.scan(
                lambda cr, s: (model.interphase_step(cr, s), None),
                carry,
                start + 1 + jnp.arange(BENCH_STEPS),
            )[0]
        )

        # Warmup (compile + first run) + validity: a run that overflows its
        # cell capacity measured dropped pairs, not the force field.
        carry = chunk(carry, jnp.asarray(0))
        jax.block_until_ready(carry[0])
        overflow = int(carry[4][0])
        if overflow > 0:
            capacity *= 2
            print(
                f"cell capacity overflow ({overflow}); retrying at {capacity}",
                file=sys.stderr,
            )
            continue

        t0 = time.perf_counter()
        reps = 3
        for r in range(reps):
            carry = chunk(carry, jnp.asarray((r + 1) * BENCH_STEPS))
        jax.block_until_ready(carry[0])
        dt = (time.perf_counter() - t0) / reps

        steps_per_s = BENCH_STEPS / dt
        return steps_per_s * model.n, steps_per_s
    raise RuntimeError("cell capacity overflow persisted after retries")


def _bench_env():
    env = dict(os.environ)
    # Persistent compile cache: axon-tunnel compiles run ~minutes, and a
    # variant retry (or a rerun of the whole bench) must not pay twice.
    env.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")
    return env


def _tpu_healthy(timeout_s=180):
    """Run a trivial device computation in a throwaway subprocess.

    The axon TPU tunnel wedges for minutes after a worker crash; a health
    probe (instead of launching a 25-minute variant into a dead tunnel)
    keeps the benchmark's wall clock bounded.
    """
    code = (
        "import jax, jax.numpy as jnp; "
        "print('HEALTH', float(jnp.ones((8, 8)).sum()))"
    )
    try:
        out = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=timeout_s, env=_bench_env(),
        )
        return "HEALTH 64.0" in out.stdout
    except subprocess.TimeoutExpired:
        return False


def _wait_for_tpu(max_wait_s=900):
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < max_wait_s:
        if _tpu_healthy():
            return True
        print("TPU unhealthy; waiting 60s for tunnel recovery", file=sys.stderr)
        time.sleep(60)
    return False


def measure_tpu():
    """Measure engine variants and report the best one that works.

    Each variant runs in a subprocess with a hard timeout: the experimental
    axon TPU tunnel has been observed to wedge or crash on specific Mosaic
    compiles, and a hang must cost a variant, not the whole benchmark.  The
    reliable XLA dense-slab engine runs first to bank a valid number; the
    Pallas kernel then gets one shot at beating it.
    """
    variants = [
        ("dense-xla", False, True),
        ("pallas", True, True),
        ("gather-xla", False, False),
    ]
    best = None
    for name, use_pallas, use_dense in variants:
        if best is not None and name == "gather-xla":
            break  # gather engine is the slow fallback; skip once banked
        if not _wait_for_tpu():
            print("TPU did not recover; skipping remaining variants",
                  file=sys.stderr)
            break
        code = (
            "import sys, json; sys.path.insert(0, %r); import bench; "
            "bs, sp = bench._measure_variant(%r, %r); "
            "print('BENCHRESULT ' + json.dumps({'bead_steps': bs, 'steps': sp}))"
            % (str(REPO), use_pallas, use_dense)
        )
        try:
            out = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True, text=True, timeout=1800, env=_bench_env(),
            )
            for line in out.stdout.splitlines():
                if line.startswith("BENCHRESULT "):
                    data = json.loads(line[len("BENCHRESULT "):])
                    print(f"variant {name}: {data['bead_steps']:.3g} bead-steps/s",
                          file=sys.stderr)
                    if best is None or data["bead_steps"] > best[0]:
                        best = (data["bead_steps"], data["steps"], name)
                    break
            else:
                print(f"variant {name} failed:\n{out.stderr[-2000:]}",
                      file=sys.stderr)
        except subprocess.TimeoutExpired:
            print(f"variant {name} timed out", file=sys.stderr)
    if best is None:
        raise RuntimeError("all engine variants failed")
    return best


def measure_baseline():
    """Single-thread C++ cell-list baseline (reference-equivalent)."""
    if BASELINE_CACHE.exists():
        return json.loads(BASELINE_CACHE.read_text())["bead_steps_per_s"]
    src = REPO / "genome_cycle_tpu" / "native" / "bench_baseline.cpp"
    if not src.exists():
        return None
    exe = REPO / "bench_baseline"
    try:
        subprocess.run(
            ["g++", "-O2", "-march=native", "-funsafe-math-optimizations",
             "-std=c++17", "-o", str(exe), str(src)],
            check=True, capture_output=True,
        )
        out = subprocess.run(
            [str(exe), str(N_BEADS), "20", str(BALL_RADIUS)],
            check=True, capture_output=True, text=True, timeout=1200,
        )
        value = float(json.loads(out.stdout.strip())["bead_steps_per_s"])
        BASELINE_CACHE.write_text(json.dumps({"bead_steps_per_s": value}))
        return value
    except Exception as ex:
        print(f"baseline build/run failed: {ex}", file=sys.stderr)
        return None


def main():
    bead_steps, steps_per_s, variant = measure_tpu()
    baseline = measure_baseline()
    vs = (bead_steps / baseline) if baseline else 0.0
    print(
        json.dumps(
            {
                "metric": "bead_steps_per_s_per_chip",
                "value": round(bead_steps),
                "unit": "bead-steps/s",
                "vs_baseline": round(vs, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
