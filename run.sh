#!/bin/sh
# End-to-end recipes mirroring the reference run.sh (reference run.sh:1-31).
# Raw twitter/office/fb datasets must be placed under $DATA_ROOT (the
# reference archive ships without them); the sync recipes below are fully
# self-contained.
DATA_ROOT=${DATA_ROOT:-../datasets}
S1="python -m bridged_gnn_tpu.cli.main_bridged_graph --data_root $DATA_ROOT"
S2="python -m bridged_gnn_tpu.cli.main_graph_knowledge_transfer"

# 0. synthetic (self-contained smoke recipe)
$S1 --dataset_name sync_unrelational --k_within 3 --k_cross 10 \
    --num_epoch 100 --start_eval_epoch 80 --eval_per_epoch 5 --seed 0 \
    --version v2 --save --out_dir ./data_bridged_graph --ckpt_dir ./ckpt
$S2 --num_layer 2 --hidden_dim 64 --to_undirected \
    --path_data ./data_bridged_graph/sync_unrelational_bridged_graph.npz

# 1. twitter, non-graph setting
$S1 --k_within 6 --k_cross 20 --num_epoch 400 --start_eval_epoch 300 \
    --epsilon 0.5 --seed 0 --save --dataset_name twitter_unrelational \
    --check_within
$S2 --num_layer 2 --hidden_dim 128 --to_undirected \
    --path_data ../data_bridged_graph/twitter_unrelational_bridged_graph.npz

# 2. office amazon→dslr
$S1 --hidden_dim 128 --num_epoch 400 --start_eval_epoch 300 --epsilon 0.5 \
    --k_within 3 --k_cross 20 --seed 0 --save \
    --dataset_name office_amazon2dslr --version v2 --check_within \
    --check_cross
$S2 --num_layer 2 --hidden_dim 64 --to_undirected \
    --path_data ../data_bridged_graph/office_amazon2dslr_bridged_graph.npz

# 3. office amazon→webcam
$S1 --hidden_dim 128 --num_epoch 400 --start_eval_epoch 300 --epsilon 0.5 \
    --k_within 3 --k_cross 8 --seed 0 --save \
    --dataset_name office_amazon2webcam --version v2 --check_within \
    --check_cross
$S2 --num_layer 2 --hidden_dim 128 --to_undirected \
    --path_data ../data_bridged_graph/office_amazon2webcam_bridged_graph.npz

# 4. facebook hamilton→caltech (step-2 with --no_dtc)
$S1 --hidden_dim 64 --k_within 0 --k_cross 50 --num_epoch 400 \
    --start_eval_epoch 300 --epsilon 0.5 --seed 0 \
    --dataset_name fb_hamilton2caltech --check_within --check_cross \
    --thres_feat_sim 0.0 --save
$S2 --num_epoch 300 --num_layer 2 --hidden_dim 64 --to_undirected --no_dtc \
    --path_data ../data_bridged_graph/fb_hamilton2caltech_bridged_graph.npz

# 5. facebook howard→simmons
$S1 --hidden_dim 64 --k_within 0 --k_cross 50 --num_epoch 400 \
    --start_eval_epoch 300 --epsilon 0.5 --seed 0 \
    --dataset_name fb_howard2simmons --check_within --check_cross \
    --thres_feat_sim 0.0 --eval_per_epoch 5 --save
$S2 --num_epoch 200 --num_layer 2 --hidden_dim 64 \
    --path_data ../data_bridged_graph/fb_howard2simmons_bridged_graph.npz
