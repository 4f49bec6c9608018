#!/usr/bin/env python
"""Zero-dependency line coverage for the package via ``sys.monitoring`` (PEP 669).

The image has no coverage.py / pytest-cov and no pip egress; this tool fills
the gap with the stdlib: a LINE-event callback that records each line's first
hit and then returns ``sys.monitoring.DISABLE`` for that location, so steady-
state overhead is near zero (unlike ``trace``, which is 10-50x).

Usage:

    python scripts/stdlib_coverage.py -m pytest tests/ -q     # run + record
    python scripts/stdlib_coverage.py --report                # print misses

The run phase writes ``/tmp/dmt_coverage.json`` ({abspath: [hit lines]}).
The report phase statically derives each source file's executable lines
(``dis.findlinestarts`` over the compiled module, recursing into nested code
objects) and prints, per file, the executable lines never hit.

Scope is the repo package + repo-root drivers; the stdlib, site-packages and
tests themselves are not monitored.  This is a dev tool for finding untested
branches, not a CI gate — line coverage can't see untaken branch *directions*
on one-line conditionals.
"""

from __future__ import annotations

import dis
import json
import os
import runpy
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCOPE_PREFIXES = (
    os.path.join(REPO, "debiasing_multi_modal_tpu") + os.sep,
    os.path.join(REPO, "bench.py"),
    os.path.join(REPO, "__graft_entry__.py"),
)
OUT_PATH = os.environ.get("DMT_COVERAGE_OUT", "/tmp/dmt_coverage.json")
TOOL_ID = 5  # sys.monitoring.COVERAGE_ID


def _in_scope(filename: str) -> bool:
    return filename.startswith(SCOPE_PREFIXES)


def run(argv: list[str]) -> None:
    hits: dict[str, set[int]] = {}
    mon = sys.monitoring

    def on_line(code, lineno):
        fn = code.co_filename
        if _in_scope(fn):
            hits.setdefault(fn, set()).add(lineno)
        return mon.DISABLE  # first hit recorded; stop monitoring this location

    # runpy puts the wrapped script's dir at sys.path[0]; restore the repo
    # root so the package resolves exactly as under a plain `python -m`
    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    mon.use_tool_id(TOOL_ID, "dmt-coverage")
    mon.register_callback(TOOL_ID, mon.events.LINE, on_line)
    mon.set_events(TOOL_ID, mon.events.LINE)
    # make the tool transparent to the wrapped program's argv
    sys.argv = argv
    code = 0
    try:
        if argv[0] == "-m":
            sys.argv = argv[1:]
            runpy.run_module(argv[1], run_name="__main__", alter_sys=True)
        else:
            runpy.run_path(argv[0], run_name="__main__")
    except SystemExit as e:
        code = e.code if isinstance(e.code, int) else 0
    finally:
        mon.set_events(TOOL_ID, 0)
        mon.free_tool_id(TOOL_ID)
        with open(OUT_PATH, "w") as f:
            json.dump({k: sorted(v) for k, v in hits.items()}, f)
        print(f"[stdlib_coverage] wrote {OUT_PATH} ({len(hits)} files)",
              file=sys.stderr)
    sys.exit(code)


def _executable_lines(path: str) -> set[int]:
    with open(path, "rb") as f:
        src = f.read()
    lines: set[int] = set()
    stack = [compile(src, path, "exec")]
    while stack:
        co = stack.pop()
        for _, lineno in dis.findlinestarts(co):
            if lineno:  # drop None and the synthetic line-0 RESUME prologue
                lines.add(lineno)
        for const in co.co_consts:
            if isinstance(const, type(co)):
                stack.append(const)
    return lines


def report(min_miss: int = 1) -> None:
    with open(OUT_PATH) as f:
        hits = {k: set(v) for k, v in json.load(f).items()}
    # include scoped files never imported at all
    all_files = []
    pkg = os.path.join(REPO, "debiasing_multi_modal_tpu")
    for root, _dirs, files in os.walk(pkg):
        if "__pycache__" in root:
            continue
        all_files.extend(os.path.join(root, fn) for fn in files if fn.endswith(".py"))
    all_files += [os.path.join(REPO, "bench.py"), os.path.join(REPO, "__graft_entry__.py")]

    total_exec = total_hit = 0
    rows = []
    for path in sorted(all_files):
        execu = _executable_lines(path)
        hit = hits.get(path, set()) & execu
        miss = sorted(execu - hit)
        total_exec += len(execu)
        total_hit += len(hit)
        if len(miss) >= min_miss:
            rows.append((path, len(execu), miss))
    for path, n_exec, miss in rows:
        rel = os.path.relpath(path, REPO)
        pct = 100.0 * (n_exec - len(miss)) / max(n_exec, 1)
        print(f"{rel}: {pct:.0f}% ({len(miss)} missed)")
        # compress runs of consecutive lines for readability
        runs, start, prev = [], None, None
        for ln in miss:
            if start is None:
                start = prev = ln
            elif ln == prev + 1:
                prev = ln
            else:
                runs.append((start, prev)); start = prev = ln
        if start is not None:
            runs.append((start, prev))
        print("   ", ", ".join(f"{a}" if a == b else f"{a}-{b}" for a, b in runs))
    print(f"\nTOTAL: {100.0 * total_hit / max(total_exec, 1):.1f}% "
          f"({total_hit}/{total_exec} executable lines)")


if __name__ == "__main__":
    args = sys.argv[1:]
    if not args or args[0] == "--report":
        report()
    else:
        run(args)
