from splatpu.data.synthetic import make_random_cloud, make_lookat_camera
