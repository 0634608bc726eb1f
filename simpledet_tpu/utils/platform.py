"""TPU detection that works under PJRT plugins.

`jax.devices()[0].platform` reports the PLUGIN name (e.g. "axon" for the
remote-TPU tunnel), not the hardware family, so `platform == "tpu"` misses
real TPU chips behind a plugin and silently routes hot paths (ApproxTopK,
Pallas kernels) onto their slow fallbacks. `device_kind` reports the chip
("TPU v5 lite"), which is what kernel dispatch actually cares about.
"""


def is_tpu():
    import jax

    try:
        devs = jax.devices()
    except Exception:  # pragma: no cover
        return False
    if not devs:
        return False
    d = devs[0]
    return (d.platform == "tpu"
            or "tpu" in (getattr(d, "device_kind", "") or "").lower())
