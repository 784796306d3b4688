"""Dataset download CLI: `python -m gpv_tpu.cli.download data_dir=<dir>
[images_only=true] [include_test_images=true]`."""
import sys


def main(argv=None):
    args = dict(a.split("=", 1) for a in (argv or sys.argv[1:]))
    from gpv_tpu.data.download import download_all
    download_all(args["data_dir"],
                 images_only=args.get("images_only", "").lower() == "true",
                 include_test_images=args.get(
                     "include_test_images", "").lower() == "true")


if __name__ == "__main__":
    main()
