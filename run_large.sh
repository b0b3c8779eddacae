#!/bin/bash
# Large-model runs with the blessed per-dataset seeds (parity with the
# reference run_large.sh).

if [ -z "$1" ]; then
  echo "Usage: $0 {bunny|dragon|happy|armadillo|drill|lucy|sphere|torus|all}"
  exit 1
fi

run() { python -m tropical.stanford.train -e -m large -d "$1" -s "$2"; }

case "$1" in
  bunny)     run bunny 31 ;;
  dragon)    run dragon 13 ;;
  happy)     run happy 6 ;;
  armadillo) run armadillo 2 ;;
  drill)     run drill 5 ;;
  lucy)      run lucy 25 ;;
  sphere)    run sphere 1 ;;
  torus)     run torus 1 ;;
  all)
    run bunny 31; run dragon 13; run happy 6
    run armadillo 2; run drill 5; run lucy 25
    ;;
  *) echo "Invalid option."; exit 1 ;;
esac
