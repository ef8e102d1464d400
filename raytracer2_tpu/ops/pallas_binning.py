"""Mosaic binning-kernel probe: can a TPU kernel bin (ray, cluster) pairs
faster than XLA's ~75 ns/pair sort/gather/scatter floor?

Round-4 closed the pair-sweep question (ops/pallas_pairs.py): the sweep
kernel runs at VPU speed-of-light and what loses is the XLA data movement
AROUND it — bin/argsort 148 ms + pair gather 85 ms + scatter-min 65 ms vs
the bundle engine's 55 ms TOTAL at quick scale. The stated round-5
candidate was "move the BINNING itself into a kernel" (README roadmap;
VERDICT r4 #1): an in-kernel counting sort by cluster id producing
per-block (ray, cluster) pair lists.

Architectural analysis first (this module's docstrings are the record):
counting sort needs SCATTER — each pair writes its ray id (and its 32-B
ray record, if the pair gather is fused) to a data-dependent address. The
TPU has NO vector scatter: Mosaic vector stores address contiguous
lanes only, and data-dependent addressing falls to the SCALAR core, one
element per loop step. The grid on TPU is sequential, so a cross-step
cursor table in SMEM is legal (no atomics needed — that part of the GPU
recipe does translate), but every pair still costs a scalar
load-compute-store chain. `scatter_rate_probe` below measures exactly
that chain — a fori_loop of dynamic scalar stores into VMEM through an
SMEM cursor — isolated from everything else, which bounds ANY in-kernel
counting sort from below:

    t_bin >= pairs * measured_ns_per_scalar_store

Measured on TPU v5e (scripts/binning_ab.py, 2^22 elements): 28.0 ns per
scalar store-chain step — and a real binning kernel does ~2x this work
per pair (cursor read-modify-write + ray-id store + optionally 8 f32 of
ray record). At quick scale's 4.2 M pairs that is >= 235 ms for the
binning alone vs 55 ms for the ENTIRE bundle-engine trace; at cluster
granularity (the formulation that would actually beat the union tax,
~41 M pairs at ladder) it is >= 2.3 s. The XLA scatter path it was
meant to replace costs ~75 ns/pair — the kernel CANNOT go much below it
because the hardware primitive (one scalar port, ~1 GHz, multi-cycle
dependent chains) is the same one XLA's scatter emitter uses.

Verdict: NEGATIVE, closed at the architecture level with a measured
bound. The union tax is the price of SIMD sharing on a machine without
vector scatter; the bundle walk remains the production engine. The
traversal levers that remain live elsewhere: bundle COMPOSITION (sort
keys — see _cand2_sort_key), cluster shape (cs=256 retest), and
whole-frame wins (banding, fused fetches).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scatter_kernel(ids_ref, out_ref, cursor_ref, stage_ref):
    """One grid step: BLOCK scalar scatter-chain iterations. Each step
    reads an id from SMEM, bumps its cursor, and stores the loop index at
    the cursored SMEM address — the minimal dependent chain any
    counting-sort binning kernel must execute per pair. (Mosaic scalar
    stores can only target SMEM — data-dependent addressing never touches
    the vector unit, which is the whole architectural point being
    measured.)"""
    i = pl.program_id(0)
    block = ids_ref.shape[0]
    n_bins = cursor_ref.shape[0]
    stage_n = stage_ref.shape[0]

    @pl.when(i == 0)
    def _():
        def init(j, c):
            cursor_ref[j] = 0
            return c

        jax.lax.fori_loop(0, n_bins, init, 0)

    def body(j, carry):
        c = ids_ref[j]
        slot = cursor_ref[c]
        cursor_ref[c] = slot + 1
        stage_ref[slot % stage_n] = j
        return carry + slot

    acc = jax.lax.fori_loop(0, block, body, 0)
    out_ref[i, 0] = acc  # keep the chain observable


@partial(jax.jit, static_argnames=("block", "n_bins", "interpret"))
def scatter_rate_probe(ids: jax.Array, block: int = 8192,
                       n_bins: int = 256,
                       interpret: bool = False) -> jax.Array:
    """Run n scalar scatter-chain steps (n = ids.size, grid of n/block);
    returns a [grid] checksum vector (timing is the caller's job).
    ids must be int32 in [0, n_bins)."""
    n = ids.shape[0]
    assert n % block == 0
    grid = (n // block,)
    return pl.pallas_call(
        _scatter_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[pl.BlockSpec((block,), lambda i: (i,),
                                   memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.SMEM((n_bins,), jnp.int32),
                            pltpu.SMEM((2048,), jnp.int32)],
        ),
        out_shape=jax.ShapeDtypeStruct((grid[0], 1), jnp.int32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ids)
