"""Ad-hoc oracle parity runner for iterating on new queries.

Usage: python tests/quick_check.py <query> [<query> ...] [--sf SFDIR]
Not collected by pytest (no test_ prefix); the sweep covers these
queries on every pytest run once registered.
"""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    import ray

    from tests.conftest import SF_ORACLE, assert_query_matches_oracle

    args = sys.argv[1:]
    sf = SF_ORACLE
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        del args[i:i + 2]
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    try:
        for name in args:
            assert_query_matches_oracle(name, sf)
            print(f"OK {name} @ {sf}")
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
