"""HLO collective-inventory audit of the sharded training programs.

BASELINE.md's scaling design claims "zero-communication rollout, psum-only
update" (SURVEY.md §2.3: envs shard over hosts with no traffic; the learner
is pure data-parallel). A real-pod measurement is one command away
(tools/scaling_bench.py) but needs hardware; these helpers pin the claim at
the ARTIFACT level instead by parsing the compiled HLO's collective
definitions. Shared by tests/test_collectives.py (8-device virtual mesh)
and the driver-visible ``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

import re

# Matches sync collectives AND the async forms XLA may rewrite them into
# (`x-start`/`x-done` pairs), with or without a ROOT prefix. Keyed on the
# OP NAME after the result type, not the SSA variable name: GSPMD names
# variables after the op (`%all-reduce.1 = ...`), but shard_map-lowered
# collectives get underscore names (`%reduce_scatter.7 = f32[2] reduce-
# scatter(...)`) that a variable-name match silently misses. For async
# pairs only the `-done` line is counted: its result type equals the sync
# op's (the `-start` yields an implementation tuple), so one async
# collective contributes exactly one inventory entry with the same
# (kind, type) the sync form would.
_COLLECTIVE_DEF = re.compile(
    r"(?:ROOT )?%\S+ = ((?:\([^)]*\))|(?:\S+)) (all-reduce|all-gather|"
    r"all-to-all|collective-permute|reduce-scatter)(-start|-done)?\("
)


def collective_defs(hlo_text: str) -> list:
    """[(op_kind, result_type_string)] for every collective DEFINITION in
    optimized HLO text (get-tuple-element consumers excluded; async
    start/done pairs counted once, at the -done, as the base kind)."""
    out = []
    for line in hlo_text.splitlines():
        m = _COLLECTIVE_DEF.match(line.strip())
        if m and m.group(3) != "-start":
            out.append((m.group(2), m.group(1)))
    return out


def assert_rollout_communication_free(hlo_text: str) -> None:
    """The sharded rollout's ONLY collective is the fused episode-stat
    reduction (3 f32 scalars) at its tail — env stepping and both network
    forwards are communication-free. Holds for BN-free architectures; BN
    models additionally all-reduce channel-sized batch stats in their
    train-mode forwards (use ``assert_rollout_param_scale_only``)."""
    defs = collective_defs(hlo_text)
    assert len(defs) == 1, (
        f"rollout must have exactly the episode-stat all-reduce, got: {defs}"
    )
    kind, rtype = defs[0]
    assert kind == "all-reduce", defs[0]
    assert rtype == "(f32[], f32[], f32[])", defs[0]


def _f32_operand_sizes(rtype: str) -> list:
    sizes = []
    for dims in re.findall(r"f32\[([\d,]*)\]", rtype):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        sizes.append(n)
    return sizes


def assert_rollout_param_scale_only(hlo_text: str, max_elems: int) -> None:
    """BN-architecture rollout invariant: exactly one episode-stat scalar
    tuple all-reduce, plus (train-mode BN) channel-sized f32 batch-stat
    reductions — every collective is an f32 all-reduce no bigger than
    ``max_elems`` (pass the largest parameter leaf); no rollout buffer
    (u8 obs / pred masks / s32 actions) ever travels."""
    defs = collective_defs(hlo_text)
    stat_tuples = [d for d in defs if d[1] == "(f32[], f32[], f32[])"]
    assert len(stat_tuples) == 1, (
        f"expected exactly one episode-stat all-reduce, got: {defs}"
    )
    for kind, rtype in defs:
        assert kind == "all-reduce", (kind, rtype)
        assert (
            "u8[" not in rtype and "pred[" not in rtype and "s32[" not in rtype
        ), f"rollout buffer leaked into a collective: {rtype}"
        for n in _f32_operand_sizes(rtype):
            assert n <= max_elems, (
                f"oversized rollout collective operand ({n} > {max_elems} "
                f"elems — batch-scale, not param/stat-scale): {rtype}"
            )


def assert_update_is_psum_only(hlo_text: str) -> None:
    """The sharded update communicates ONLY via f32 all-reduces (gradient /
    BN-stat / loss-scalar psums): no re-layout collectives, and no rollout
    buffer (u8 obs, pred masks, s32 actions) ever travels — minibatch
    assembly must stay shard-local."""
    defs = collective_defs(hlo_text)
    assert defs, "update must communicate (gradient psum)"
    for kind, rtype in defs:
        assert kind == "all-reduce", (kind, rtype)
        assert (
            "u8[" not in rtype and "pred[" not in rtype and "s32[" not in rtype
        ), f"non-f32 collective (buffer traffic leaked into the update): {rtype}"
