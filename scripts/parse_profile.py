"""Offline re-parse of a jax.profiler trace dir: device time by HLO opcode.

Fixes the opcode extraction of profile_edit_step.py: an HLO event name is
'%op.123 = bf16[...]{2,1,0:T(8,128)(2,1)} opcode(...)' — the layout tile
spec contains parentheses, so splitting on the first '(' yields the type,
not the opcode. The type token has no spaces, so the opcode is the second
whitespace token after ' = '.

Usage: python scripts/parse_profile.py <trace_dir_or_xplane.pb> [steps]
"""
from __future__ import annotations

import glob
import os
import sys
from collections import defaultdict


def opcode_of(name: str) -> str:
    # formats seen: '%op.1 = <type> opcode(...)' and '%op.1, <type> opcode(...)'
    rest = None
    if " = " in name:
        rest = name.split(" = ", 1)[1]
    elif ", " in name and name.startswith("%"):
        rest = name.split(", ", 1)[1]
    if rest is not None:
        if rest.startswith("("):  # tuple type: skip to the matching ')'
            depth = 0
            for i, ch in enumerate(rest):
                depth += ch == "("
                depth -= ch == ")"
                if depth == 0:
                    rest = rest[i + 1 :].lstrip()
                    break
            # after the tuple-type strip the opcode is the FIRST token
            # ('(bf16[8], f32[4]) tuple(%x, %y)' -> 'tuple(%x, %y)')
            return rest.split("(", 1)[0].strip() or "<unnamed>"
        parts = rest.split(None, 1)
        if len(parts) == 2:
            return parts[1].split("(", 1)[0]
        return parts[0].split("(", 1)[0]
    return name.split(".", 1)[0].lstrip("%") or "<unnamed>"


def main() -> None:
    from jax.profiler import ProfileData  # type: ignore

    path = sys.argv[1]
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    if os.path.isdir(path):
        files = sorted(
            glob.glob(os.path.join(path, "**", "*.xplane.pb"), recursive=True),
            key=os.path.getmtime,
        )
        path = files[-1]
    pd = ProfileData.from_file(path)
    by_kind: dict = defaultdict(float)
    by_name: dict = defaultdict(float)
    total = 0.0
    for plane in pd.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = ev.name
                if name.startswith("%while"):
                    continue
                dur = ev.duration_ns / 1e6
                by_kind[opcode_of(name)] += dur
                by_name[name.split(" = ", 1)[0]] += dur
                total += dur
    print(f"== device time by HLO opcode (total {total:.1f} ms, {steps} steps, {os.path.basename(path)}) ==")
    for k, v in sorted(by_kind.items(), key=lambda kv: -kv[1]):
        print(f"  {k:<28s} {v:9.2f} ms  {100*v/max(total,1e-9):5.1f}%  {v/steps:8.3f} ms/step")
    print("\n== top 30 ops ==")
    for k, v in sorted(by_name.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {v:9.2f} ms  {v/steps:7.3f} ms/step  {k[:100]}")


if __name__ == "__main__":
    main()
