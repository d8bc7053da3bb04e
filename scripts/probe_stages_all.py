"""Run the fused-quality AND ADM stage bisections in ONE process (one
first-fetch sync, one session — CLAUDE.md: cross-session numbers are not
comparable, batch TPU probes).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_stages_all.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import probe_quality_stages
import probe_adm_stages


def main():
    rc = probe_quality_stages.main()
    rc |= probe_adm_stages.main()
    return rc


if __name__ == "__main__":
    sys.exit(main())
