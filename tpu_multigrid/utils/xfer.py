"""Relay-safe host<->device transfer for complex arrays.

Measured failure mode of the axon remote-compile relay (2026-08-20,
window ~20:45-21:30+): ANY complex array crossing the host<->device
boundary — as a jit argument, a fetched output, or a device_put constant
— fails with `UNIMPLEMENTED: TPU backend error`, while the same complex
math wholly inside a program, chained device-resident complex arrays
between programs, and all real-dtype transfers work fine. (Bisect:
f32 matmul/fori/AOT all pass; complex input, complex fetch, and complex
device_put all fail; f32-in -> complex-inside -> f32-out passes.) This
explains rounds of `stencil*` phase failures previously attributed to
program size: every phase shipped a host-built complex v while the
passing canary was f32.

The shim keeps complex arrays OFF the boundary: ingress transfers the
real and imaginary planes as real arrays and combines them on-device
inside a jitted program (the pattern verified to work); egress splits
on-device and fetches two real arrays. On CPU (tests) and healthy TPU
windows this is equivalent, costing one extra fused elementwise pass.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def _real_dtype(cdtype) -> np.dtype:
    return np.dtype("float64" if np.dtype(cdtype) == np.complex128
                    else "float32")


@functools.lru_cache(maxsize=8)
def _combine(cdtype_name: str):
    dt = jnp.dtype(cdtype_name)
    return jax.jit(lambda re, im: (re + 1j * im).astype(dt))


@functools.lru_cache(maxsize=2)
def _split():
    return jax.jit(lambda z: (jnp.real(z), jnp.imag(z)))


@functools.lru_cache(maxsize=256)
def _full_fn(shape, value_re: float, value_im: float, dtype_name: str):
    # cache the jitted FN, never its result: a cached concrete array
    # becomes a hoisted closure constant when device_full is called
    # inside a traced function (breaking AOT executables' input counts),
    # and a first call under tracing would leak a tracer into the cache
    dt = jnp.dtype(dtype_name)
    val = (value_re
           if not value_im and not jnp.issubdtype(dt, jnp.complexfloating)
           else complex(value_re, value_im))
    return jax.jit(lambda: jnp.full(shape, val, dt))


def device_full(shape, value, dtype) -> jnp.ndarray:
    """Eager `jnp.full`/`ones`/`zeros` replacement safe for complex
    dtypes: eager complex constructors materialize a HOST constant and
    transfer it (fails on the relay, same class as device_put); this
    builds the constant INSIDE a jitted program instead. Inside a traced
    function it inlines as a plain HLO constant."""
    v = complex(value)
    return _full_fn(tuple(shape), v.real, v.imag, jnp.dtype(dtype).name)()


# eager jnp.zeros_like on a complex array also materializes a host
# constant (fails on the relay); inside jit it is a pure device fill
device_zeros_like = jax.jit(jnp.zeros_like)


def device_complex(arr, dtype=jnp.complex64) -> jnp.ndarray:
    """Host array -> device array of complex `dtype` without a complex
    host->device transfer. Real inputs transfer directly. dtype=None
    keeps the input's own dtype."""
    a = np.asarray(arr)
    if dtype is None:
        dtype = a.dtype
    if not np.iscomplexobj(a):
        return jnp.asarray(a, dtype)
    rt = _real_dtype(dtype)
    re = jnp.asarray(np.ascontiguousarray(a.real), rt)
    im = jnp.asarray(np.ascontiguousarray(a.imag), rt)
    return _combine(np.dtype(dtype).name)(re, im)


def host_complex(x) -> np.ndarray:
    """Device array -> numpy without a complex device->host transfer.
    Real arrays fetch directly."""
    if not jnp.iscomplexobj(x):
        return np.asarray(x)
    re, im = _split()(x)
    return np.asarray(re) + 1j * np.asarray(im)
