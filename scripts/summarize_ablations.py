"""Summarize an r3_ablation_queue.sh log into a markdown table.

Parses the `=== cmd ===` / measurement / `rc=N` blocks appended by
scripts/r3_ablation_queue.sh and prints one row per config with its
ms/step, img/s (when present), and exit status — the table NOTES.md and
docs/DESIGN.md cite for the round's perf story.

    python scripts/summarize_ablations.py [logs/r3_ablations.log]
"""

import re
import sys


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "logs/r3_ablations.log"
    with open(path) as f:
        text = f.read()

    blocks = re.split(r"^=== (.+) ===$", text, flags=re.M)[1:]
    rows = []
    for cmd, body in zip(blocks[::2], blocks[1::2]):
        rc = re.search(r"^rc=(\d+)$", body, flags=re.M)
        ms = re.search(r"(\d+(?:\.\d+)?) ms(?:/step)?", body)
        ips = re.search(r"(\d+(?:\.\d+)?) img/s", body)
        if ips is None:  # bench.py prints a JSON line (unit images/sec)
            ips = re.search(r'"value": (\d+(?:\.\d+)?)', body)
        passfail = re.findall(r"^(PASS|FAIL) (.*)$", body, flags=re.M)
        oom = "RESOURCE_EXHAUSTED" in body or "ResourceExhausted" in body
        label = cmd.replace("python scripts/", "")
        status = (
            "OOM" if oom else
            ("rc=%s" % rc.group(1)) if rc and rc.group(1) != "0" else "ok"
        )
        detail = "; ".join("%s %s" % pf for pf in passfail)
        rows.append((
            label,
            ms.group(1) if ms else "-",
            ips.group(1) if ips else "-",
            status,
            detail,
        ))

    print("| config | ms/step | img/s | status | notes |")
    print("|---|---|---|---|---|")
    for r in rows:
        print("| %s | %s | %s | %s | %s |" % r)


if __name__ == "__main__":
    main()
