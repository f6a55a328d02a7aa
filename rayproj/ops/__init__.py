"""Operation registry.

The engine equivalent of the reference's pj_list.h constructor table:
``REGISTRY`` maps +proj=NAME → Operation subclass. New operators register
with the ``@register`` decorator (SURVEY.md §2.9 extension surface).
"""

from __future__ import annotations

REGISTRY: dict[str, type] = {}


def register(cls):
    REGISTRY[cls.name] = cls
    return cls


def load_all() -> None:
    """Import all operator modules (populates REGISTRY)."""
    from . import (  # noqa: F401
        adams,
        aea,
        affine,
        axisswap,
        cart,
        conic_misc,
        cyl_misc,
        extensions,
        geogoffset,
        gridshift,
        horner,
        healpix_ops,
        igh_ops,
        isea,
        helmert,
        latlong,
        lcc,
        merc,
        misc_sph,
        mod_ster,
        more_proj,
        misc_world,
        molodensky,
        pipeline,
        som,
        pseudocyl,
        sch,
        stere,
        tmerc,
        unitconvert,
        utility,
    )


def get_operation_class(name: str):
    if not REGISTRY:
        load_all()
    if name not in REGISTRY:
        load_all()
    return REGISTRY.get(name)
