"""API-key verification — the ``basic_auth_setup.py`` analogue.

The reference validates keys against the laji-auth upstream
(``laji_api.get_api_key_info``) with a per-process cache and checks
``found`` + ``downloadType`` + ``apiKeyExpires`` (basic_auth_setup.py:
9-32). The engine has no network, so the key store is an injected dict of
the same info records; verification logic, expiry comparison and the
memoized lookup match the reference semantics. ``now`` is explicit — the
batch engine has no implicit wall clock."""
from __future__ import annotations

import datetime as _dt
from functools import lru_cache

API_KEY_TYPE = "API_KEY"   # app.config['API_KEY_TYPE'] analogue

_KEY_STORE: dict[str, dict] = {}


def configure_key_store(store: dict[str, dict]) -> None:
    """Install the key-info records (≙ the upstream auth service) and
    reset the memo cache."""
    global _KEY_STORE
    _KEY_STORE = dict(store)
    _get_api_key_info.cache_clear()


@lru_cache(maxsize=1024)
def _get_api_key_info(api_key: str) -> tuple | None:
    """Memoized lookup (the reference's flask_caching layer)."""
    info = _KEY_STORE.get(api_key)
    if info is None:
        return None
    return tuple(sorted(info.items()))


def verify_api_key(api_key: str, *, now: _dt.datetime,
                   key_type: str = API_KEY_TYPE) -> str | None:
    """Return the key's id when valid else None — exact
    ``verify_password`` semantics: non-empty key, record found with
    ``found`` truthy, matching downloadType, unexpired
    (``strptime('%Y-%m-%d') > now``)."""
    api_key = (api_key or "").strip()
    if not api_key:
        return None
    packed = _get_api_key_info(api_key)
    if packed is None:
        return None
    info = dict(packed)
    if (info.get("found")
            and info.get("downloadType") == key_type
            and _dt.datetime.strptime(info["apiKeyExpires"],
                                      "%Y-%m-%d") > now):
        return info["id"]
    return None
