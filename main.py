"""Demo runner CLI — replaces the reference's comment-toggled ``main.py``
(reference main.py:10-27) with proper subcommands.

    python main.py --demo demo1                 # closed-loop MPC (host loop)
    python main.py --demo demo9 --mode astar    # A* front-end only
    python main.py --demo demo1 --mode scan     # fully-jitted lax.scan loop
    python main.py --demo demo1 --gif out.gif   # animate (needs viz)

Runs on CPU by default: the per-step host loop would pay the remote-TPU
compile tunnel on every distinct shape. Use ``--platform`` to override.
"""

from __future__ import annotations

import argparse
import sys


def _parse():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--demo", default="demo1",
                    help="demo1..demo11 (reference src/demo_setting.py:82-341)")
    ap.add_argument("--mode", default="closed",
                    choices=["closed", "scan", "astar", "open", "perf",
                             "time", "legacy1", "legacy3"],
                    help="closed: host receding-horizon loop; scan: jitted "
                         "lax.scan rollout; astar: front-end only; open: "
                         "two-phase open-loop (simulation.run equivalent); "
                         "perf: A*/open/closed state+input comparison "
                         "(show_performance equivalent); time: wall-clock "
                         "A* + open-loop timing (calc_time equivalent)")
    ap.add_argument("--out-prefix", default=None,
                    help="perf mode: write {prefix}_states/inputs/paths.png")
    ap.add_argument("--max-steps", type=int, default=30)
    ap.add_argument("--N", type=int, default=None,
                    help="override horizon (free and fix)")
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--f32", action="store_true",
                    help="solve in float32 (default float64 on host modes)")
    ap.add_argument("--gif", default=None, help="write animation GIF here")
    ap.add_argument("--json", default=None,
                    help="dump per-step trajectory records to this JSON file")
    ap.add_argument("-q", "--quiet", action="store_true")
    return ap.parse_args()


def main():
    args = _parse()

    import jax

    jax.config.update("jax_platforms", args.platform)
    if not args.f32:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.runtime import (
        ClosedLoopRunner,
        astar_host,
    )
    from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.scenarios import (
        build_scenario,
        get_demo,
    )
    from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.scenarios.demos import (
        default_params_for,
    )

    dtype = jnp.float32 if args.f32 else jnp.float64
    demo = get_demo(args.demo)
    p = default_params_for(args.demo)
    if args.N is not None:
        import dataclasses

        p = dataclasses.replace(p, N_free=args.N, N_fix=args.N)

    if args.mode == "astar":
        scn, _ = build_scenario(demo, dtype=dtype)
        ref = astar_host.reference_path_for(
            np.asarray(scn.grid), demo.start, demo.goal
        )
        print(f"{args.demo}: A* path with {ref.shape[1]} points")
        if not args.quiet:
            for i in range(ref.shape[1]):
                print(f"  {ref[0, i]:7.2f} {ref[1, i]:7.2f} {ref[2, i]:7.3f}")
        return 0

    if args.mode == "time":
        from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.runtime import (
            Simulation,
        )

        rep = Simulation(dtype=dtype).calc_time(args.demo, N=args.N or 10)
        print(f"{args.demo}: A* {rep.astar_s * 1e3:.2f} ms "
              f"(reference {rep.extras['reference_astar_s'] * 1e3:.1f} ms); "
              f"open-loop N={rep.open_loop_N} {rep.open_loop_s:.2f} s "
              f"feas={rep.open_loop_feas} "
              f"(reference N=10: {rep.extras['reference_open_loop_N10_s']} s)")
        return 0

    if args.mode == "perf":
        from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.runtime import (
            Simulation,
        )

        prefix = args.out_prefix or f"{args.demo}_perf"
        recs = Simulation(dtype=dtype).show_performance(
            args.demo, N_open=args.N or 50, max_steps=args.max_steps,
            out_prefix=prefix,
        )
        for label, rec in recs.items():
            xs = rec.get("x")
            n = 0 if xs is None else np.asarray(xs).shape[1]
            print(f"  {label}: {n} states recorded")
        print(f"wrote {prefix}_states.png / _inputs.png / _paths.png")
        return 0

    if args.mode == "scan":
        from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.runtime.scan_loop import (
            make_scan_rollout,
        )

        scn, shape = build_scenario(demo, dtype=dtype)
        ref = astar_host.reference_path_for(
            np.asarray(scn.grid), demo.start, demo.goal
        )
        roll = make_scan_rollout(shape, p, max_steps=args.max_steps,
                                 dtype=dtype)
        final, traj = jax.jit(roll)(
            scn, jnp.asarray(ref, dtype), jnp.asarray(ref.shape[1])
        )
        xs = np.asarray(traj["x"])
        feas = np.asarray(traj["feas"])
        fix = np.asarray(traj["fixtime"])
        act = np.asarray(traj["active"])
        for k in range(xs.shape[0]):
            if not act[k]:
                break
            mode = "fix " if fix[k] else "free"
            print(f"  k={k:3d} [{mode}] feas={bool(feas[k])} "
                  f"x=({xs[k, 0]:7.3f}, {xs[k, 1]:7.3f}, {xs[k, 2]:6.3f})")
        print(f"{args.demo}: reached={bool(final.reached)} "
              f"failed={bool(final.failed)} steps={int(final.k)} "
              f"final=({float(final.x0[0]):.3f}, {float(final.x0[1]):.3f})")
        _maybe_dump(args, xs[: int(final.k)].T, None)
        return 0 if not bool(final.failed) else 1

    if args.mode == "open":
        from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.runtime.open_loop import (
            run_open_loop,
        )

        res = run_open_loop(args.demo, N=args.N or 50, dtype=dtype)
        print(f"{args.demo}: open-loop feas={res.feas} "
              f"Ts_opt={res.Ts_opt:.4f} xN=({res.x[0, -1]:.3f}, "
              f"{res.x[1, -1]:.3f}, {res.x[2, -1]:.3f})")
        _maybe_dump(args, res.x, res.u)
        if args.gif:
            _animate_open(args, demo, res, dtype)
        return 0 if res.feas else 1

    # closed-loop host runner (reference simulation.run_closedLoop)
    runner = ClosedLoopRunner(demo, params=p, dtype=dtype,
                              max_steps=args.max_steps)
    if args.mode in ("legacy1", "legacy3"):
        # legacy drivers: closed_loop_mpc (src/closed_loop.py:142) /
        # closed_loop_mpc3 (:211)
        res = runner.run_legacy(
            mode="mpc1" if args.mode == "legacy1" else "mpc3",
            verbose=not args.quiet)
    else:
        res = runner.run(verbose=not args.quiet)
    final = res.steps[-1].x if res.steps else np.asarray(demo.start)
    print(f"{args.demo}: reached_goal={res.reached_goal} "
          f"aborted={res.aborted_infeasible} steps={len(res.steps)} "
          f"final=({final[0]:.3f}, {final[1]:.3f}, {final[2]:.3f})")
    xs = np.stack([s.x for s in res.steps], axis=1) if res.steps else None
    us = np.stack([s.u for s in res.steps], axis=1) if res.steps else None
    _maybe_dump(args, xs, us)
    if args.gif:
        from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.viz import (
            animate_closed_loop,
        )

        animate_closed_loop(demo, res, args.gif)
        print(f"wrote {args.gif}")
    return 0 if not res.aborted_infeasible else 1


def _maybe_dump(args, xs, us):
    if args.json and xs is not None:
        import json

        rec = {"demo": args.demo, "x": xs.tolist()}
        if us is not None:
            rec["u"] = us.tolist()
        with open(args.json, "w") as f:
            json.dump(rec, f)
        print(f"wrote {args.json}")


def _animate_open(args, demo, res, dtype):
    from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.viz import (
        animate_open_loop,
    )

    animate_open_loop(demo, res, args.gif)
    print(f"wrote {args.gif}")


if __name__ == "__main__":
    sys.exit(main())
