#!/usr/bin/env python3
"""Extract the reference's function-registration name surface.

Scans the reference checkout's src/Functions and src/AggregateFunctions
for every name a user-visible function registers under:

  1. ``static constexpr auto name = "..."`` constants (the name every
     FunctionFactory::registerFunction<Class>() call registers);
  2. string-literal ``registerFunction("...")`` /
     ``registerAlias("...")`` / ``registerAliasUnchecked("...")`` calls
     (multiline-tolerant).

Names that are not legal bare SQL identifiers are dropped (a handful of
registration-table artifacts). Output: one name per line, sorted, to
stdout. This is the input of graft.tools.NameAudit — the pair is the
repo's reproducible function-surface audit:

    python3 scripts/extract_fn_names.py /root/reference > audit/ref_fn_names.txt
    sbt "runMain graft.tools.NameAudit audit/ref_fn_names.txt audit/unresolved.txt"
"""
import pathlib
import re
import sys

ref = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else "/root/reference")
pat_const = re.compile(r'static constexpr auto name = "([^"]+)"')
pat_reg = re.compile(
    r'register(?:Function|Alias|AliasUnchecked)\s*\(\s*"([^"]+)"', re.S)
valid = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")

names = set()
for sub in ("src/Functions", "src/AggregateFunctions"):
    for p in (ref / sub).rglob("*"):
        if p.suffix in (".cpp", ".h"):
            text = p.read_text(errors="ignore")
            names.update(pat_const.findall(text))
            names.update(pat_reg.findall(text))

for name in sorted(n for n in names if valid.match(n)):
    print(name)
