"""Capture `.explain("formatted")` for a set of registered queries into
per-query text files — the before/after plan evidence for optimization
rounds (judge deliverable `plans/r<N>/<query>_{before,after}.txt`).

Usage:
    python tools/gen_round_plans.py OUT_DIR SUFFIX [sf_dir] name [name ...]

`before` plans are produced by running this same script from a git worktree
checked out at the pre-round commit (copy the script in; it resolves the
package from its own location), writing into the main repo's OUT_DIR.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"
    names = sys.argv[4:]
    os.makedirs(out_dir, exist_ok=True)

    from relationaldecomposition_spark.queries import QUERIES
    from relationaldecomposition_spark.session import get_spark

    spark = get_spark("gen_round_plans")
    failures = []
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain(mode="formatted")
            text = buf.getvalue()
        except Exception as e:  # noqa: BLE001 - report and continue
            failures.append(name)
            print(f"FAIL {name}: {e}")
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"== {name} ({suffix}) — explain('formatted') at "
                    f"{sf_dir} ==\n\n" + text)
        print(f"wrote {path} ({len(text)} chars)")
    spark.stop()
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
