#!/usr/bin/env bash
# vcp-tpu installer: dependency checks, directories, default config,
# systemd units (producer, consumer, per-chip consumer template, embedded
# redis), logrotate. Role parity with the reference installer's
# check/dirs/config/systemd/logrotate flow — adapted to a Python/TPU
# deployment: the dependency probe checks jax + a TPU platform instead of
# ffmpeg/nvidia-smi/NVENC, and the per-device template pins a TPU chip via
# TPU_VISIBLE_DEVICES rather than CUDA_VISIBLE_DEVICES.
set -euo pipefail

PREFIX=${PREFIX:-/opt/vcp-tpu}
CONF_DIR=${CONF_DIR:-/etc/vcp}
DATA_DIR=${DATA_DIR:-/var/lib/vcp}
LOG_DIR=${LOG_DIR:-/var/log/vcp}
PYTHON=${PYTHON:-python3}
REPO_DIR=$(cd "$(dirname "$0")" && pwd)

usage() {
  echo "usage: $0 {check|install|systemd|uninstall}"
  exit 1
}

check_deps() {
  echo "== dependency check =="
  command -v "$PYTHON" >/dev/null || { echo "FAIL: python3 missing"; exit 1; }
  "$PYTHON" - <<'PY' || exit 1
import sys
assert sys.version_info >= (3, 10), "python >= 3.10 required"
try:
    import jax
    print(f"  jax {jax.__version__}: OK")
except ImportError:
    print("FAIL: jax not importable"); raise SystemExit(1)
try:
    import numpy, yaml  # noqa
    print("  numpy + pyyaml: OK")
except ImportError as e:
    print(f"FAIL: {e}"); raise SystemExit(1)
PY
  if command -v g++ >/dev/null; then
    echo "  g++: OK (native entropy engine will compile)"
  else
    echo "  g++: missing (Python entropy fallback will be used — slower)"
  fi
  "$PYTHON" - <<PY
import sys; sys.path.insert(0, "$REPO_DIR")
try:
    import jax
    plats = {d.platform for d in jax.devices()}
    print(f"  devices: {jax.devices()} ({'TPU OK' if plats - {'cpu'} else 'CPU ONLY'})")
except Exception as e:
    print(f"  WARNING: device probe failed: {e}")
PY
  echo "check complete"
}

make_dirs() {
  echo "== directories =="
  mkdir -p "$CONF_DIR" "$DATA_DIR"/{raw,shared,encoded} "$LOG_DIR"
  echo "  $CONF_DIR $DATA_DIR/{raw,shared,encoded} $LOG_DIR"
}

write_config() {
  if [[ -f "$CONF_DIR/config.yaml" ]]; then
    echo "  $CONF_DIR/config.yaml exists, leaving untouched"
    return
  fi
  sed -e "s|/data/raw_videos|$DATA_DIR/raw|" \
      -e "s|/mnt/shared/input|$DATA_DIR/shared|" \
      -e "s|/data/encoded|$DATA_DIR/encoded|" \
      "$REPO_DIR/config.example.yaml" > "$CONF_DIR/config.yaml"
  echo "  wrote $CONF_DIR/config.yaml"
}

install_code() {
  echo "== install to $PREFIX =="
  mkdir -p "$PREFIX"
  cp -r "$REPO_DIR/vcp_tpu" "$REPO_DIR/pyproject.toml" "$PREFIX/"
  cat > /usr/local/bin/vcp <<EOF
#!/usr/bin/env bash
export PYTHONPATH="$PREFIX:\${PYTHONPATH:-}"
exec $PYTHON -m vcp_tpu.cli "\$@"
EOF
  chmod +x /usr/local/bin/vcp
  echo "  installed /usr/local/bin/vcp"
}

write_systemd() {
  echo "== systemd units =="
  cat > /etc/systemd/system/vcp-redis.service <<EOF
[Unit]
Description=vcp embedded mini-redis (control plane)
After=network.target

[Service]
ExecStart=/usr/local/bin/vcp redis-serve --host 127.0.0.1 --port 6379
Restart=always
RestartSec=2
StandardOutput=append:$LOG_DIR/redis.log
StandardError=append:$LOG_DIR/redis.log

[Install]
WantedBy=multi-user.target
EOF

  cat > /etc/systemd/system/vcp-producer.service <<EOF
[Unit]
Description=vcp producer (watch + publish encode tasks)
After=network.target

[Service]
ExecStart=/usr/local/bin/vcp producer -c $CONF_DIR/config.yaml
Restart=always
RestartSec=5
StandardOutput=append:$LOG_DIR/producer.log
StandardError=append:$LOG_DIR/producer.log

[Install]
WantedBy=multi-user.target
EOF

  cat > /etc/systemd/system/vcp-consumer.service <<EOF
[Unit]
Description=vcp consumer (TPU encoder)
After=network.target

[Service]
ExecStart=/usr/local/bin/vcp consumer -c $CONF_DIR/config.yaml
Restart=always
RestartSec=5
StandardOutput=append:$LOG_DIR/consumer.log
StandardError=append:$LOG_DIR/consumer.log

[Install]
WantedBy=multi-user.target
EOF

  # per-chip template: vcp-consumer@N pins TPU chip N
  cat > /etc/systemd/system/vcp-consumer@.service <<EOF
[Unit]
Description=vcp consumer on TPU chip %i
After=network.target

[Service]
Environment=TPU_VISIBLE_DEVICES=%i
ExecStart=/usr/local/bin/vcp consumer -c $CONF_DIR/config.yaml -n tpu%i
Restart=always
RestartSec=5
StandardOutput=append:$LOG_DIR/consumer-%i.log
StandardError=append:$LOG_DIR/consumer-%i.log

[Install]
WantedBy=multi-user.target
EOF

  cat > /etc/logrotate.d/vcp <<EOF
$LOG_DIR/*.log {
    daily
    rotate 7
    compress
    missingok
    notifempty
    copytruncate
}
EOF
  systemctl daemon-reload 2>/dev/null || true
  echo "  units: vcp-redis, vcp-producer, vcp-consumer, vcp-consumer@<chip>"
  echo "  enable with: systemctl enable --now vcp-redis vcp-consumer"
}

uninstall() {
  systemctl disable --now vcp-producer vcp-consumer vcp-redis 2>/dev/null || true
  rm -f /etc/systemd/system/vcp-{producer,consumer,redis}.service \
        /etc/systemd/system/vcp-consumer@.service /etc/logrotate.d/vcp \
        /usr/local/bin/vcp
  rm -rf "$PREFIX"
  echo "uninstalled (config/data/logs left in place)"
}

case "${1:-}" in
  check) check_deps ;;
  install) check_deps; make_dirs; write_config; install_code; write_systemd ;;
  systemd) write_systemd ;;
  uninstall) uninstall ;;
  *) usage ;;
esac
