#!/usr/bin/env python3
"""Regenerate the PSL rule tables in src/main/scala/graft/operators/Psl.scala
from a public_suffix_list.dat file (publicsuffix.org — public Mozilla data;
the Debian `publicsuffix` package ships a snapshot at
/usr/share/publicsuffix/public_suffix_list.dat).

Only the ICANN section is embedded (the standard crawl-curation choice:
private-section entries like `*.blogspot.com` would fragment per-tenant
hosts into separate "registrable domains", the opposite of what a
domain-cap / domain-stats policy wants). 1-label exact rules (`com`,
`uk`, …) are OMITTED because they are indistinguishable from the
algorithm's implicit default rule `*` (both yield a 1-label public
suffix).

Usage: python3 scripts/gen_psl.py [dat_path] > /tmp/psl_tables.scala
The output is the generated-data section spliced into Psl.scala between
the GENERATED BEGIN/END markers.
"""
import sys

DAT = sys.argv[1] if len(sys.argv) > 1 else \
    "/usr/share/publicsuffix/public_suffix_list.dat"
CHUNK = 400  # rules per private chunk method (keeps bytecode < 64 KB/method)


def parse_icann(path):
    rules = []
    in_icann = False
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line == "// ===BEGIN ICANN DOMAINS===":
                in_icann = True
                continue
            if line == "// ===END ICANN DOMAINS===":
                break
            if not in_icann or not line or line.startswith("//"):
                continue
            rules.append(line)
    return rules


def punycode(rule):
    """ASCII (xn--) twin of a rule with non-ASCII labels, or None.
    A crawler sees hosts on the wire in punycode, so IDN rules must
    match BOTH forms. CAVEAT: the stdlib codec implements IDNA2003;
    labels that encode differently (or fail) under IDNA2008/UTS46 —
    what browsers and crawlers actually put on the wire — get a
    divergent or missing twin. Failures are REPORTED (stderr + a
    generated comment) so a silent coverage gap is impossible; if the
    environment has the third-party `idna` (UTS46) package we prefer
    it."""
    if all(ord(c) < 128 for c in rule):
        return None
    try:
        try:
            import idna  # third-party UTS46 codec, if present

            def enc(lbl):
                return idna.encode(lbl, uts46=True).decode("ascii")
        except ImportError:
            def enc(lbl):
                return lbl.encode("idna").decode("ascii")
        return ".".join(
            lbl if all(ord(c) < 128 for c in lbl) else enc(lbl)
            for lbl in rule.split("."))
    except Exception:
        return None


# The matcher's depth ceiling: Psl.publicSuffixLen walks at most this
# many labels. classify() asserts every rule fits, so a future PSL
# snapshot with deeper rules fails LOUDLY with the action required
# instead of a bare KeyError.
MAX_EXACT = 4
MAX_WILD_BASE = 2
MAX_EXC = 3

# Rules whose punycode twin could not be generated (see punycode()).
twin_failures = []


def classify(rules):
    out = {"exact2": [], "exact3": [], "exact4": [],
           "wild1": [], "wild2": [], "exc2": [], "exc3": []}
    rules = list(rules)
    for r in list(rules):
        body = r.lstrip("!*.") if r.startswith(("!", "*.")) else r
        if all(ord(c) < 128 for c in body):
            continue  # no twin needed
        p = punycode(body)
        if p is None:
            twin_failures.append(r)
        elif r.startswith("!"):
            rules.append("!" + p)
        elif r.startswith("*."):
            rules.append("*." + p)
        else:
            rules.append(p)
    for r in rules:
        if r.startswith("!"):
            body = r[1:]
            n = len(body.split("."))
            assert n <= MAX_EXC, (
                f"exception rule '{r}' is {n} labels deep but "
                f"Psl.publicSuffixLen only walks {MAX_EXC}-label "
                f"exceptions — raise its depth cap AND these buckets")
            out[f"exc{n}"].append(body)
        elif r.startswith("*."):
            base = r[2:]
            assert "*" not in base, f"non-leading wildcard unsupported: {r}"
            n = len(base.split("."))
            assert n <= MAX_WILD_BASE, (
                f"wildcard rule '{r}' has a {n}-label base but "
                f"Psl.publicSuffixLen only walks {MAX_WILD_BASE}-label "
                f"wildcard bases — raise its depth cap AND these buckets")
            out[f"wild{n}"].append(base)
        else:
            assert "*" not in r, f"embedded wildcard unsupported: {r}"
            n = len(r.split("."))
            if n == 1:
                continue  # identical to the implicit default rule
            assert n <= MAX_EXACT, (
                f"exact rule '{r}' is {n} labels deep but "
                f"Psl.publicSuffixLen only walks {MAX_EXACT}-label exact "
                f"rules — raise its depth cap AND these buckets")
            out[f"exact{n}"].append(r)
    for k in out:
        out[k] = sorted(set(out[k]))
    return out


def scala_seq(name, items, doc):
    lines = [f"  /** {doc} */"]
    if len(items) <= CHUNK:
        lines.append(f"  val {name}: Seq[String] = Seq(")
        lines.append(_body(items))
        lines.append("  )")
    else:
        chunks = [items[i:i + CHUNK] for i in range(0, len(items), CHUNK)]
        for ci, ch in enumerate(chunks):
            lines.append(f"  private def {name}Chunk{ci}: Seq[String] = Seq(")
            lines.append(_body(ch))
            lines.append("  )")
        parts = " ++ ".join(f"{name}Chunk{ci}" for ci in range(len(chunks)))
        lines.append(f"  val {name}: Seq[String] = {parts}")
    return "\n".join(lines)


def _body(items):
    # pack several quoted rules per line, ~72 cols
    out, cur = [], "    "
    for it in items:
        tok = f'"{it}", '
        if len(cur) + len(tok) > 76:
            out.append(cur.rstrip())
            cur = "    "
        cur += tok
    if cur.strip():
        out.append(cur.rstrip())
    out[-1] = out[-1].rstrip(",").rstrip(", ")
    return "\n".join(out)


def main():
    rules = parse_icann(DAT)
    t = classify(rules)
    n_skipped = sum(1 for r in rules
                    if not r.startswith(("!", "*")) and "." not in r)
    print(f"  // GENERATED by scripts/gen_psl.py from the ICANN section of")
    print(f"  // public_suffix_list.dat ({len(rules)} rules; {n_skipped}")
    print(f"  // 1-label exact rules omitted — identical to the implicit")
    print(f"  // default; private section excluded by design). Do not edit.")
    print(f"  // IDN punycode-twin failures: {len(twin_failures)}" +
          ("" if not twin_failures
           else " — " + ", ".join(twin_failures)))
    if twin_failures:
        print(f"twin generation FAILED for {len(twin_failures)} rules "
              f"(on-the-wire punycode hosts under them fall back to the "
              f"wrong rule): {twin_failures}", file=sys.stderr)
    docs = {
        "exact2": "Exact 2-label rules (`co.uk`-class).",
        "exact3": "Exact 3-label rules (`k12.ca.us`-class).",
        "exact4": "Exact 4-label rules (`pvt.k12.ma.us`-class — the "
                  "deepest exact rules in the ICANN section).",
        "wild1": "1-label wildcard bases: `*.<tld>` rules where every "
                 "second-level name is itself a public suffix.",
        "wild2": "2-label wildcard bases (`*.nom.br`, the Japanese "
                 "designated cities, `*.sch.uk`).",
        "exc2": "2-label exception rules (the text after `!`).",
        "exc3": "3-label exception rules (`!city.<city>.jp`-class).",
    }
    for name in ["exact2", "exact3", "exact4", "wild1", "wild2",
                 "exc2", "exc3"]:
        print()
        print(scala_seq(name, t[name], docs[name] +
                        f" {len(t[name])} rules."))


if __name__ == "__main__":
    main()
