#!/bin/bash
# Follow-up hardware probe queue (after run_hw_queue.sh, 2026-08-18):
# - longcat full-model probes with the token_chunk capacity lever (the
#   unchunked runs OOM'd at compile: distill +1.31G, refine +5.41G over
#   the 15.75G budget)
# - vae_conv_ab with params passed as jit args (closure constants blew the
#   remote-compile payload limit: HTTP 413)
# - depth high-res with a window-size ladder (110 -> 72 -> 48 -> 24)
cd /root/repo
run() {
  name=$1; shift
  echo "=== $name: $(date +%H:%M:%S) ==="
  timeout 1800 "$@" > "/tmp/hw_${name}.log" 2>&1
  echo "--- $name exit=$? ---"
  grep -v WARNING "/tmp/hw_${name}.log" | tail -8
}
run longcat_distill_c8 python scripts/probe_full_model_longcat_int8.py --phase distill --token-chunk 8
run longcat_refine_c16 python scripts/probe_full_model_longcat_int8.py --phase refine --token-chunk 16
run depth_highres python scripts/probe_depth_highres.py
run vae_conv_ab python scripts/probe_vae_conv2d_ab.py
echo "=== queue2 done $(date +%H:%M:%S) ==="
