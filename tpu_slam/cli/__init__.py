"""Command-line runners — the launch-file layer, ROS-free.

The reference composed its pipeline with roslaunch XML (SURVEY.md §2.1
item 14); here each runner is a python -m entry point over the same config
tree (pipeline.config):

  python -m tpu_slam.cli.make_dataset  --out seq/ --n-scans 40
  python -m tpu_slam.cli.run_odometry  --dataset seq/ --out traj.npz
  python -m tpu_slam.cli.run_slam      --dataset seq/ --out out/ --checkpoint ckpt.npz
  python -m tpu_slam.cli.run_calibration --method gradient --out calib.yaml
"""
