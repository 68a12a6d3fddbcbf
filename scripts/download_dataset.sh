#!/usr/bin/env bash
# Fetch the curated PLINDER-derived training/validation dataset and the
# precomputed MSA feature shards (zenodo; reference
# scripts/download_dataset.sh:1-27), laid out for
# `python -m physdock_tpu.train.train --dataset_dir DEST/train_val`.
#
# ~hundreds of GB once unpacked; wget -c makes the whole script resumable.
set -euo pipefail
DEST=${1:-dataset}
mkdir -p "$DEST"
cd "$DEST"

# --- curated train/val systems (preprocessed from PLINDER) + weights
wget -c https://zenodo.org/records/15178859/files/train_val.zip
wget -c https://zenodo.org/records/15220255/files/train_val_samples_weights.json
unzip -n train_val.zip
# physdock_tpu.train.sampler.WeightedSystemSampler reads
# <dataset_dir>/train_val_weights.json (one weight per system id)
cp -f train_val_samples_weights.json train_val/train_val_weights.json

# --- precomputed MSA features (split archive)
for part in aa ab ac; do
    wget -c "https://zenodo.org/records/15178859/files/msa_features_${part}"
done
for part in ad ae; do
    wget -c "https://zenodo.org/records/15206943/files/msa_features_${part}"
done
cat msa_features_a{a,b,c,d,e} > msa_features.tar.gz
tar -zxf msa_features.tar.gz

# --- precomputed UniProt MSA features (for multimer pairing; split archive)
for part in aa ab; do
    wget -c "https://zenodo.org/records/15206943/files/uniprot_msa_features_${part}"
done
for part in ac ad ae af; do
    wget -c "https://zenodo.org/records/15209515/files/uniprot_msa_features_${part}"
done
for part in ag ah; do
    wget -c "https://zenodo.org/records/15210625/files/uniprot_msa_features_${part}"
done
cat uniprot_msa_features_a{a,b,c,d,e,f,g,h} > uniprot_msa_features.tar.gz
tar -zxf uniprot_msa_features.tar.gz

echo "dataset ready: $DEST/train_val (+ msa_features/, uniprot_msa_features/)"
echo "train: python -m physdock_tpu.train.train --dataset_dir $DEST/train_val -o ckpts/"
