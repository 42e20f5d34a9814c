"""Terrain library for the simulation harness.

The reference ships a library of Gazebo worlds — stairs, 4 pallet heights,
tunnels, mazes, v-chimney, SAR rubble (qm_description/urdf/{stairs,pallets,
tunnel,mazes,vchimney,sar}/). For a batched TPU sim the equivalent is an
analytic/height-field terrain function z = h(x, y), selected by static name
(recompile per terrain type, parameters traced so batches can randomize them).
"""
from __future__ import annotations

import jax.numpy as jnp


def flat(x, y, params):
    (height,) = params
    return jnp.full_like(x, height)


def slope(x, y, params):
    """Inclined plane starting at x0: grade per meter in x."""
    x0, grade = params
    return jnp.maximum(x - x0, 0.0) * grade


def step(x, y, params):
    """Single step of given height at x >= x0 (pallet edge)."""
    x0, height = params
    return jnp.where(x >= x0, height, 0.0)


def stairs(x, y, params):
    """Staircase from x0: rise per tread of depth `run`, up to n steps."""
    x0, run, rise, n = params
    idx = jnp.clip(jnp.floor((x - x0) / run) + 1.0, 0.0, n)
    return idx * rise


def wave(x, y, params):
    """Sinusoidal rubble field (SAR-terrain stand-in)."""
    amp, lx, ly = params
    return amp * jnp.sin(2 * jnp.pi * x / lx) * jnp.cos(2 * jnp.pi * y / ly)


TERRAINS = {
    "flat": flat,
    "slope": slope,
    "step": step,
    "stairs": stairs,
    "wave": wave,
}


def terrain_height(name: str, x, y, params):
    return TERRAINS[name](x, y, jnp.asarray(params))


def default_params(name: str):
    return {
        "flat": (0.0,),
        "slope": (0.5, 0.15),
        "step": (0.5, 0.1),
        "stairs": (0.5, 0.25, 0.08, 5.0),
        "wave": (0.03, 0.8, 0.9),
    }[name]
