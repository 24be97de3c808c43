#!/bin/bash
# Round-5: regenerate the IPDnet scaling corpus after the VM recycle
# wiped /root/data_r4 (same default stage seeds as runs_r4/gen_corpora.sh
# => bit-identical corpus; generate() skips existing files so this is
# resumable). dev/test first so a fit can start as soon as enough train
# scenes exist; train scenes are written in index order (nested-prefix
# property preserved).
set -x
cd /root/repo
P="python -m fnssl_tpu.cli.main simulate"
$P --preset ipdnet --stage dev  --T 4.5 --num-source 2 --compact \
   --num 512   --out /root/data_r4/ipdnet/dev   || exit 1
$P --preset ipdnet --stage test --T 4.5 --num-source 2 --compact \
   --num 512   --out /root/data_r4/ipdnet/test  || exit 1
$P --preset ipdnet --stage train --T 4.5 --num-source 2 --compact \
   --num 32768 --out /root/data_r4/ipdnet/train || exit 1
echo "=== GEN 32K DONE $(date) ==="
