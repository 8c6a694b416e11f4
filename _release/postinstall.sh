#!/bin/bash
# Post-install: service account + unit activation (reference
# _release/postinstall.sh semantics for this package's unit name).
set -e

username=cacophony-processing
if ! id "$username" &> /dev/null; then
    useradd --system \
            --user-group \
            --home-dir /var/cache/$username \
            --create-home \
            --shell /usr/sbin/nologin \
            "$username"
fi

systemctl daemon-reload
systemctl enable cacophony-classifier
systemctl restart cacophony-classifier
