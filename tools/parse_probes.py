#!/usr/bin/env python3
"""Extract the LAST [runone] result per (query, sfdir) from a probe log.

Usage: python3 tools/parse_probes.py .scale/probe_r11.log
Prints JSON: {"sf100": {name: sec}, "sf10": {name: sec}, ...}
Later duplicates win (re-probes supersede contaminated runs). NOT part
of the library - probe-log bookkeeping only.
"""
import json
import re
import sys


def main(path):
    out = {}
    current = None  # (sfkey, query)
    for line in open(path, encoding="utf-8"):
        m = re.match(r"\[probe\] (\S+) @ (\S+) begin", line)
        if m:
            sfkey = m.group(2).rstrip("/").rsplit("/", 1)[-1]
            current = (sfkey, m.group(1))
            continue
        m = re.match(r"\[runone\] (\S+) rows=(\d+) time=([0-9.]+)s", line)
        if m and current and current[1] == m.group(1):
            sfkey, q = current
            out.setdefault(sfkey, {})[q] = {
                "sec": float(m.group(3)), "rows": int(m.group(2))}
    print(json.dumps(out, indent=1, sort_keys=True))


if __name__ == "__main__":
    main(sys.argv[1])
