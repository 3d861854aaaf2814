#!/bin/bash
# Fetch-and-verify the MIT-licensed cl100k_base BPE ranks table and
# install it where graft resolves it (classpath resource), switching
# token_count_cl100k from ESTIMATE to bit-EXACT mode (see
# graft.expressions.BpeRanks / TokenCountCl100k).
#
# This build environment is zero-egress, so the artifact cannot be
# vendored into the repo; run this once from any network-connected
# machine (or CI step) and re-run `sbt test` — Cl100kExactSpec flips
# from canceled to green.
#
# The sha256 pin is the published hash from tiktoken's public loader
# (openai_public.py); if upstream ever re-publishes the artifact,
# update the pin from that source, never from the downloaded bytes.
set -euo pipefail

URL="https://openaipublic.blob.core.windows.net/encodings/cl100k_base.tiktoken"
SHA256="223921b76ee99bde995b7ff738513eef100fb51d18c93f9fd5c6c2573f6f6e65"
DEST="${1:-$(dirname "$0")/../src/main/resources/cl100k_base.tiktoken}"

tmp="$(mktemp)"
trap 'rm -f "$tmp"' EXIT
echo "fetching $URL ..."
curl -fsSL "$URL" -o "$tmp"
got="$(sha256sum "$tmp" | cut -d' ' -f1)"
if [ "$got" != "$SHA256" ]; then
  echo "sha256 mismatch: got $got, want $SHA256 — refusing to install" >&2
  exit 1
fi
mkdir -p "$(dirname "$DEST")"
mv "$tmp" "$DEST"
trap - EXIT
lines="$(wc -l < "$DEST")"
echo "installed $DEST ($lines rank lines, sha256 verified)"
echo "token_count_cl100k will now resolve mode=EXACT from the classpath."
