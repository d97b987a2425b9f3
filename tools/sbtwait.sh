#!/bin/bash
# Wait until the sbt tmux pane returns to its prompt; print summary lines.
# Usage: sbtwait.sh [max_seconds]
max=${1:-900}
for i in $(seq 1 $((max/5))); do
  if tmux capture-pane -t sbt -p | tail -3 | grep -q 'sbt:airflowkafkasparkspark.*>'; then
    tmux capture-pane -t sbt -p | grep -aE "Tests:|FAILED|\[error\]|\[success\]|failed:" | tail -8
    exit 0
  fi
  sleep 5
done
echo "TIMEOUT after ${max}s"; exit 1
