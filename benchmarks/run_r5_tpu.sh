#!/bin/bash
# Round-5 TPU measurement batch. One python process per experiment
# (axon per-process session; a crashed/over-VMEM Mosaic compile only loses
# its own process). Logs under /tmp/r5/.
set -u
mkdir -p /tmp/r5
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a /tmp/r5/driver.log
  timeout "${TMO:-2400}" "$@" > "/tmp/r5/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date +%H:%M:%S))" | tee -a /tmp/r5/driver.log
}

# 1) swin whole-block fusion A/B (headline experiment)
run blockab_s0 python benchmarks/swin_block_ab.py stage0 16 default,16,8
run blockab_s1 python benchmarks/swin_block_ab.py stage1 16 default,16
run blockab_s2 python benchmarks/swin_block_ab.py stage2 16 default,8
run blockab_s3 python benchmarks/swin_block_ab.py stage3 16 4,2

# 2) end-to-end serve A/B (two-kernel default vs whole-block all stages)
run serve_base python benchmarks/swin_serve_ab.py
SEGLAND_SWIN_V3_STAGES=0,1,2 run serve_v3 python benchmarks/swin_serve_ab.py

# 3) train roofline: per-family table, then flagship deep-dive, then fused A/B
TMO=5400 run roofline_families python benchmarks/train_roofline.py families
TMO=3600 run roofline_convnext python benchmarks/train_roofline.py convnext
TMO=3600 run roofline_fused python benchmarks/train_roofline.py fused_ab
TMO=3600 run roofline_devaug python benchmarks/train_roofline.py devaug

# 5) ensemble serving pricing
run ensemble python benchmarks/ensemble_serve.py 16

# 6) end-to-end serving profile
TMO=3600 run serve_e2e python benchmarks/serve_e2e.py 256 32

# 7) giant scene
TMO=3600 run scene python benchmarks/scene_bench.py chip 4096

echo "ALL DONE $(date +%H:%M:%S)" | tee -a /tmp/r5/driver.log
