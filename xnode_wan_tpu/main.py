"""CLI entry point.

Reference: ``main.py`` — whose argparse result was overridden by a hardcoded
list (``main.py:36``) and whose YAML path pointed at a nonexistent directory
(``main.py:42``). This CLI actually parses its arguments, loads the YAML by
the given path, resolves the problem module through the registry (no
``globals()`` injection) and supports resume.

Usage:
    python -m xnode_wan_tpu.main --params configs/cube_pde.yaml \
        --funcs Ex4_1_funcs [--work_dir ./run] [--report_it 10] [--resume]
"""

from __future__ import annotations

import argparse

from xnode_wan_tpu.config import load_params
from xnode_wan_tpu.problems import load_problem
from xnode_wan_tpu.training import NODEWANSolver


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="XNODE-WAN PDE solver (TPU)",
        description=("a general purpose parabolic PDE solver using the "
                     "XNODE-WAN architecture, TPU-native"))
    parser.add_argument("-w", "--work_dir", type=str, default="./",
                        help="directory for artifacts and checkpoints")
    parser.add_argument("--params", required=True,
                        help="YAML experiment setup (reference key set)")
    parser.add_argument("--funcs", required=True,
                        help="problem name or module path (e.g. Ex4_1_funcs)")
    parser.add_argument("--report", action="store_true", default=True)
    parser.add_argument("--no-report", dest="report", action="store_false")
    parser.add_argument("--report_it", type=int, default=10)
    parser.add_argument("--show_plt", action="store_true")
    parser.add_argument("--resume", action="store_true",
                        help="resume from checkpoint_NODE.msgpack in work_dir")
    parser.add_argument("--iterations", type=int, default=None,
                        help="override the YAML iteration count")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    cfg = load_params(args.params)
    problem = load_problem(args.funcs, dim=cfg.dim)
    solver = NODEWANSolver(cfg, problem, work_dir=args.work_dir)
    if args.resume:
        solver.load_checkpoint()
    solver.train(report=args.report, report_it=args.report_it,
                 show_plt=args.show_plt, iterations=args.iterations)


if __name__ == "__main__":
    main()
