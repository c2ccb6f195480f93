#!/bin/bash
# Round-4 hardware queue 8 — chunked-execution FUSED guided serving at
# production scale (the watchdog-safe fused mode: same scan body,
# cost-weighted <=k-plain-step executions), plus the two remaining
# unmeasured e2e rows (720p refine full clip, generate_vc with the bf16
# KV cache).
# Launch: setsid bash scripts/run_hw_queue8.sh > /tmp/r4_queue8.log 2>&1 &
cd /root/repo

# (0) wait for queue7 (int6 guided loop-mode flagship) to finish
while ps -p 16368 > /dev/null 2>&1; do sleep 30; done
echo "=== 0: queue7 done ==="

# (1) Wan flagship GUIDED chunked fused serving, 480p x 49f, int4 W4A8.
# exec-chunk 4 plain-step equivalents: guided chunks of 1 (~31 s), IRR
# chunks of 2 (~42 s), plain chunks of 4 (~42 s) — all under the ~65-75 s
# watchdog. Repeat clip gives steady state (programs + layouts cached).
timeout 10800 python scripts/run_e2e_guided.py --mode fused --exec-chunk 4 \
  > /tmp/r4_wan_chunked.log 2>&1
echo "=== 1 done: $? ==="

# (2) LongCat GUIDED distilled chunked fused serving (the fast WorldForge
# mode): guided chunks of 2 (~44 s), plain chunks of 6.
timeout 7200 python scripts/run_e2e_longcat_guided.py --exec-chunk 6 \
  --clips 2 > /tmp/r4_lc_chunked.log 2>&1
echo "=== 2 done: $? ==="

# (3) 720p refine FULL clip (decode via the fixed host-first + fresh-
# process fallback; phase-ordered encode recipe)
timeout 7200 python scripts/run_e2e_refine_720p.py --clips 1 \
  > /tmp/r4_refine720f.log 2>&1
echo "=== 3 done: $? ==="

# (4) generate_vc with the bf16 KV cache (fp32 cache = 9.1 GB, OOMed 1/1)
timeout 7200 python scripts/run_e2e_vc.py --clips 2 > /tmp/r4_vc2.log 2>&1
echo "=== 4 done: $? ==="
echo QUEUE8-DONE
