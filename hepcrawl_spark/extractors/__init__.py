"""Per-format record extractors.

Each extractor is a pure-Python function ``bytes -> list[dict]`` (one
HEPRecord-shaped dict per record node found in the document), designed
to run over whole Arrow batches inside ``mapInPandas`` — the Spark side
never sees per-row Python UDFs.

Format registry: maps the ``format`` tag carried on a pages row to its
extractor callable.
"""

from __future__ import annotations

from typing import Callable, Dict, List

_REGISTRY: Dict[str, Callable[[bytes], List[dict]]] = {}


def register(fmt: str):
    """Decorator: register ``fn(html_bytes) -> [record_dict]`` for a format."""
    def _wrap(fn):
        _REGISTRY[fmt] = fn
        return fn
    return _wrap


def get_extractor(fmt: str):
    return _REGISTRY.get(fmt)


def known_formats():
    return sorted(_REGISTRY)


def _load_all():
    """Import all extractor modules so their @register decorators run."""
    from . import arxiv_oai  # noqa: F401
    from . import html_generic  # noqa: F401
    from . import marc21  # noqa: F401
    from . import marc21_slim  # noqa: F401
    from . import dnb_splash  # noqa: F401
    from . import pex_dc  # noqa: F401
    from . import base_dc  # noqa: F401
    from . import json_aps  # noqa: F401
    from . import nlm  # noqa: F401
    from . import html_theses  # noqa: F401
    from . import json_brown  # noqa: F401
    from . import json_phil  # noqa: F401
    from . import edp  # noqa: F401
    from . import elsevier  # noqa: F401
    try:
        from . import jats  # noqa: F401
    except ImportError:
        pass


_load_all()
