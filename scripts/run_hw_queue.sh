#!/bin/bash
# Sequential hardware probe queue (run when the TPU tunnel is up).
# Shortest / most-decisive first. Each probe logs to /tmp/hw_<name>.log.
cd /root/repo
run() {
  name=$1; shift
  echo "=== $name: $(date +%H:%M:%S) ==="
  timeout 1800 "$@" > "/tmp/hw_${name}.log" 2>&1
  echo "--- $name exit=$? ---"
  grep -v WARNING "/tmp/hw_${name}.log" | tail -8
}
run vae_conv_ab   python scripts/probe_vae_conv2d_ab.py
run i2v_w4        python scripts/probe_full_model_int8.py --phase i2v_w4
run depth_highres python scripts/probe_depth_highres.py
run longcat_distill python scripts/probe_full_model_longcat_int8.py --phase distill
run longcat_refine  python scripts/probe_full_model_longcat_int8.py --phase refine
run e2e_14b       python scripts/run_e2e_14b_int8.py
run bench         python bench.py
echo "=== queue done $(date +%H:%M:%S) ==="
