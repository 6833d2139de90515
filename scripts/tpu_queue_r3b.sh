#!/bin/bash
# Round-3 queued TPU A/B batch: run when the axon tunnel recovers.
# Each experiment gets a same-session control (bench-measurement-rules).
# Order: cheap A/Bs first; the 128-cubed windowed compile retry LAST
# (a >25-min remote compile is the prime suspect for tunnel outages).
set -x
cd /root/repo
mkdir -p /tmp/r3b
{
  echo "=== control (flagship) $(date -u)"
  timeout 1200 python bench.py 2>&1 | tail -3
  echo "=== s2d_stem $(date -u)"
  timeout 1200 python bench.py --override model.modules.MVCNNEncoder.s2d_stem=true 2>&1 | tail -3
  echo "=== pool-grad ROUTING=compare $(date -u)"
  timeout 1200 python -c "
import tricolo_tpu.ops.fused_bn_pool as fbp, sys
fbp.ROUTING = 'compare'
sys.argv = ['bench.py']
import bench; bench.main()" 2>&1 | tail -3
  echo "=== scatter_layout=lines $(date -u)"
  timeout 1200 python bench.py --override model.modules.VoxelCNNEncoder.scatter_layout=lines 2>&1 | tail -3
  echo "=== control rerun $(date -u)"
  timeout 1200 python bench.py 2>&1 | tail -3
  echo "=== 128c dense recipe (batch 32, remat) $(date -u)"
  timeout 1500 python bench.py --voxel-size 128 --batch-size 32 2>&1 | tail -3
  echo "=== 128c windowed retry (LAST, may kill tunnel) $(date -u)"
  timeout 2100 python bench.py --voxel-size 128 --batch-size 32 \
    --override data.voxel_transfer=windowed_compact 2>&1 | tail -3
  echo "=== done $(date -u)"
} > /tmp/r3b/results.log 2>&1
