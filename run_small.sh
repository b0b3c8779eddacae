#!/bin/bash
# Small-model runs with the blessed per-dataset seeds (parity with the
# reference run_small.sh; sphere/torus are the self-contained procedural
# datasets added by this framework).

if [ -z "$1" ]; then
  echo "Usage: $0 {bunny|dragon|happy|armadillo|drill|lucy|sphere|torus|all}"
  exit 1
fi

run() { python -m tropical.stanford.train -e -m small -d "$1" -s "$2"; }

case "$1" in
  bunny)     run bunny 1 ;;
  dragon)    run dragon 4 ;;
  happy)     run happy 2 ;;
  armadillo) run armadillo 1 ;;
  drill)     run drill 9 ;;
  lucy)      run lucy 13 ;;
  sphere)    run sphere 1 ;;
  torus)     run torus 1 ;;
  all)
    run bunny 1; run dragon 4; run happy 2
    run armadillo 1; run drill 9; run lucy 13
    ;;
  *) echo "Invalid option."; exit 1 ;;
esac
