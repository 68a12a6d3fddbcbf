#!/usr/bin/env bash
# Fetch the sequence databases used by the MSA search pipeline
# (physdock_tpu.data.msa.search / cli.run_homo_search):
# UniRef90 + MGnify (jackhmmer), UniProt TrEMBL+SwissProt (jackhmmer,
# uniprot features for multimer pairing), Uniclust30 (hhblits),
# BFD (hhblits).  Mirrors the reference scripts/download_homo_datasets.sh
# sources; resumable via wget -c.
set -euo pipefail
DOWNLOAD_DIR=${1:?usage: download_homo_datasets.sh DEST_DIR}
mkdir -p "$DOWNLOAD_DIR"

# UniRef90
wget -c -P "$DOWNLOAD_DIR/" \
    https://ftp.ebi.ac.uk/pub/databases/uniprot/uniref/uniref90/uniref90.fasta.gz
gunzip -kf "$DOWNLOAD_DIR/uniref90.fasta.gz"

# MGnify clusters
wget -c -P "$DOWNLOAD_DIR/" \
    https://storage.googleapis.com/alphafold-databases/v2.3/mgy_clusters_2022_05.fa.gz
gunzip -kf "$DOWNLOAD_DIR/mgy_clusters_2022_05.fa.gz"

# UniProt = TrEMBL + SwissProt concatenated
wget -c -P "$DOWNLOAD_DIR/" \
    https://ftp.ebi.ac.uk/pub/databases/uniprot/current_release/knowledgebase/complete/uniprot_trembl.fasta.gz
wget -c -P "$DOWNLOAD_DIR/" \
    https://ftp.ebi.ac.uk/pub/databases/uniprot/current_release/knowledgebase/complete/uniprot_sprot.fasta.gz
gunzip -f "$DOWNLOAD_DIR/uniprot_trembl.fasta.gz"
gunzip -f "$DOWNLOAD_DIR/uniprot_sprot.fasta.gz"
cat "$DOWNLOAD_DIR/uniprot_sprot.fasta" >> "$DOWNLOAD_DIR/uniprot_trembl.fasta"
mv "$DOWNLOAD_DIR/uniprot_trembl.fasta" "$DOWNLOAD_DIR/uniprot.fasta"
rm "$DOWNLOAD_DIR/uniprot_sprot.fasta"

# Uniclust30 (hhblits)
wget -c -P "$DOWNLOAD_DIR/" \
    http://wwwuser.gwdg.de/~compbiol/uniclust/2018_08/uniclust30_2018_08_hhsuite.tar.gz
mkdir -p "$DOWNLOAD_DIR/uniclust30"
tar -xzf "$DOWNLOAD_DIR/uniclust30_2018_08_hhsuite.tar.gz" -C "$DOWNLOAD_DIR/uniclust30"
rm "$DOWNLOAD_DIR/uniclust30_2018_08_hhsuite.tar.gz"

# BFD (hhblits)
wget -c -P "$DOWNLOAD_DIR/" \
    https://storage.googleapis.com/alphafold-databases/casp14_versions/bfd_metaclust_clu_complete_id30_c90_final_seq.sorted_opt.tar.gz
mkdir -p "$DOWNLOAD_DIR/bfd"
tar -xzf "$DOWNLOAD_DIR/bfd_metaclust_clu_complete_id30_c90_final_seq.sorted_opt.tar.gz" \
    -C "$DOWNLOAD_DIR/bfd"
rm "$DOWNLOAD_DIR/bfd_metaclust_clu_complete_id30_c90_final_seq.sorted_opt.tar.gz"

echo "sequence databases ready under $DOWNLOAD_DIR"
echo "search: python -m physdock_tpu.cli.run_homo_search --help"
