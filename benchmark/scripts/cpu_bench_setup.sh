#!/usr/bin/env bash
# CPU benchmarking hygiene: pin the performance governor, disable turbo,
# and optionally park SMT siblings for the duration of a command — then
# restore every setting on exit (role of the reference's
# benchmark/scripts/cpu_bench_setup.sh; same methodology as its
# benchmark/README.md "CPU setup" section).
#
# Usage:
#   sudo benchmark/scripts/cpu_bench_setup.sh [--no-smt] -- <command...>
#   sudo benchmark/scripts/cpu_bench_setup.sh --status
#
# Every change is recorded and undone by an EXIT trap, so a crashed
# benchmark never leaves the machine in a pinned state. On VMs without
# cpufreq/SMT controls the script degrades to a no-op with a notice.
set -euo pipefail

CPUFREQ=/sys/devices/system/cpu
INTEL_NO_TURBO=/sys/devices/system/cpu/intel_pstate/no_turbo
BOOST=/sys/devices/system/cpu/cpufreq/boost
SMT_CONTROL=/sys/devices/system/cpu/smt/control

declare -a RESTORE_CMDS=()

restore_all() {
    local cmd
    for cmd in "${RESTORE_CMDS[@]:-}"; do
        [ -n "$cmd" ] && eval "$cmd" || true
    done
}
trap restore_all EXIT

remember() { RESTORE_CMDS+=("$1"); }

status() {
    echo "governors:"
    for g in "$CPUFREQ"/cpu[0-9]*/cpufreq/scaling_governor; do
        [ -r "$g" ] && echo "  $g = $(cat "$g")"
    done 2>/dev/null | sort -u | head -4
    [ -r "$INTEL_NO_TURBO" ] && echo "intel no_turbo: $(cat "$INTEL_NO_TURBO")"
    [ -r "$BOOST" ] && echo "cpufreq boost: $(cat "$BOOST")"
    [ -r "$SMT_CONTROL" ] && echo "smt: $(cat "$SMT_CONTROL")"
}

if [ "${1:-}" = "--status" ]; then
    status
    exit 0
fi

PARK_SMT=0
if [ "${1:-}" = "--no-smt" ]; then
    PARK_SMT=1
    shift
fi
[ "${1:-}" = "--" ] && shift
if [ $# -eq 0 ]; then
    echo "usage: $0 [--no-smt] -- <command...>" >&2
    exit 2
fi

CHANGED=0

# 1. performance governor on every CPU
for g in "$CPUFREQ"/cpu[0-9]*/cpufreq/scaling_governor; do
    if [ -w "$g" ]; then
        old=$(cat "$g")
        if [ "$old" != "performance" ]; then
            remember "echo '$old' > '$g'"
            echo performance > "$g"
            CHANGED=1
        fi
    fi
done

# 2. turbo off (intel_pstate or acpi cpufreq boost)
if [ -w "$INTEL_NO_TURBO" ]; then
    old=$(cat "$INTEL_NO_TURBO")
    if [ "$old" != "1" ]; then
        remember "echo '$old' > '$INTEL_NO_TURBO'"
        echo 1 > "$INTEL_NO_TURBO"
        CHANGED=1
    fi
elif [ -w "$BOOST" ]; then
    old=$(cat "$BOOST")
    if [ "$old" != "0" ]; then
        remember "echo '$old' > '$BOOST'"
        echo 0 > "$BOOST"
        CHANGED=1
    fi
fi

# 3. optional SMT parking
if [ "$PARK_SMT" = "1" ] && [ -w "$SMT_CONTROL" ]; then
    old=$(cat "$SMT_CONTROL")
    if [ "$old" = "on" ]; then
        remember "echo on > '$SMT_CONTROL'"
        echo off > "$SMT_CONTROL"
        CHANGED=1
    fi
fi

if [ "$CHANGED" = "0" ]; then
    echo "# cpu_bench_setup: no tunables changed (VM or already pinned)" >&2
fi

"$@"
